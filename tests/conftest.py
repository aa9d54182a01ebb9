"""Test harness configuration.

All tests run on CPU with 8 virtual devices (the reference has no
distributed test fixture at all; this is the fake-multi-chip backend
SURVEY.md §4 prescribes) and with x64 enabled so numerical results are
directly comparable to the f64 Rust reference semantics.
"""

import os

# Must be set before jax initializes its backends.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) at a level that
# wins over shell exports; the in-process config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite's ~200 CPU executables cost
# minutes of XLA compile per run on this box's single core; cached
# reruns skip almost all of it. Gitignored; safe to delete any time.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_device_mesh():
    from picard_ica_tpu.parallel import sample_mesh

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 forced host devices, got {len(devices)}"
    return sample_mesh(devices)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
