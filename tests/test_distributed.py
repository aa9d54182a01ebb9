"""Two-process ``jax.distributed`` test (SURVEY.md §2.3 communication-
backend row).

Everything else in tests/ runs multi-device in ONE process (virtual
CPU devices); this exercises the code path that actually runs on a
multi-host pod slice: a real ``jax.distributed.initialize`` handshake
(via parallel.mesh.distributed_init), a global mesh spanning two
processes, per-process addressable shards, and GSPMD collectives over
the gloo CPU backend — asserting the distributed fit equals the
single-process one.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys

repo, pid, port = sys.argv[1], int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, repo)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from picard_ica_tpu.parallel.mesh import (
    data_sharding, distributed_init, sample_mesh,
)

distributed_init(
    coordinator_address="127.0.0.1:" + port,
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()

import numpy as np
import jax.numpy as jnp

from picard_ica_tpu.models.core import CoreOptions, run_core_jit
from picard_ica_tpu.ops.densities import Tanh
from picard_ica_tpu.ops.whitening import preprocess_f64
from picard_ica_tpu.utils.datagen import generate_bench_data

n, t = 6, 8192
x = generate_bench_data(n, t, seed=17)          # identical in both procs
xw, _, _ = preprocess_f64(np.asarray(x, np.float64), n, True, True)

devs = jax.devices()
assert len(devs) == 4, devs                      # 2 local x 2 processes
mesh = sample_mesh(devs)
sharding = data_sharding(mesh)

global_x = jax.make_array_from_callback((n, t), sharding, lambda idx: xw[idx])

opts = CoreOptions(
    density=Tanh(), ortho=True, extended=True, has_cov=True,
    m=7, ls_tries=10, use_pallas=False, data_sharding=sharding,
)
res = run_core_jit(global_x, jnp.eye(n), 1e-7, 0.01, 200, opts)

# Single-device reference in the same process.
opts1 = CoreOptions(
    density=Tanh(), ortho=True, extended=True, has_cov=True,
    m=7, ls_tries=10, use_pallas=False,
)
ref = run_core_jit(jnp.asarray(xw), jnp.eye(n), 1e-7, 0.01, 200, opts1)

w_dist = np.asarray(jax.device_get(res.w))
w_ref = np.asarray(ref.w)
assert bool(res.converged) and bool(ref.converged)
err = float(np.abs(w_dist - w_ref).max())
assert err < 1e-8, "distributed/single mismatch: %g" % err
assert int(res.n_iterations) == int(ref.n_iterations)
print("DIST_OK pid=%d iters=%d err=%.2e"
      % (pid, int(res.n_iterations), err), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_fit(tmp_path):
    """Spawn 2 processes, initialize a real distributed runtime, and
    run a sharded fit across them; both must match the single-process
    result exactly (f64, deterministic gloo all-reduces)."""
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), _REPO, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "DIST_OK" in out, f"worker {i} no DIST_OK:\n{out}"
