"""Profiling utilities (utils/profiling.py).

The committed per-call device costs in DESIGN.md and the large-N
roofline evidence (benchmarks/large_n_trace.py) all flow through
``device_trace_summary`` — wall clock is unreliable through the TPU
tunnel, so the parser is the measurement path and needs its own
coverage. Exercised here against a real jax.profiler dump on the CPU
backend (same chrome-trace schema as the TPU dumps).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picard_ica_tpu.utils.profiling import device_trace_summary, fit_with_timing


def test_device_trace_summary_parses_cpu_trace(tmp_path):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((128, 128)))
    f = jax.jit(lambda a: jnp.tanh(a @ a.T).sum())
    jax.block_until_ready(f(x))  # compile outside the trace
    with jax.profiler.trace(str(tmp_path)):
        jax.block_until_ready(f(x))
    s = device_trace_summary(str(tmp_path), device_substr="CPU")
    assert s["total_us"] > 0.0
    assert s["by_op"]  # at least one aggregated op
    assert all(v > 0 for v in s["by_op"].values())
    # per-op totals are a partition of the total (truncation to top_k
    # can only drop mass, never add it)
    assert sum(s["by_op"].values()) <= s["total_us"] + 1e-6


def test_device_trace_summary_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        device_trace_summary(str(tmp_path / "nope"))


def test_fit_with_timing_reports_throughput():
    from picard_ica_tpu import PicardConfig
    from picard_ica_tpu.utils import generate_test_data

    _, _, x = generate_test_data(4, 20_000, 3)
    out = fit_with_timing(x, PicardConfig(random_state=0, tol=1e-5), reps=1)
    assert out["converged"]
    assert out["samples_per_s"] > 0
    assert out["n_chips"] == 1
