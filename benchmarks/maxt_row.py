"""One max-T capability rung in an isolated process.

The baseline_5 max-T row measures what ONE chip can hold — which
requires an unfragmented HBM arena and a clean donation state. Run
in-process after other suite configs, a FAILED higher rung poisons
the arena for every rung below it (measured round 5: after the 6M
rung OOM'd mid-donated-execution, 4M — which fits from a fresh
process with ~4 GB of headroom — OOM'd too, and so did a plain 2 GB
transfer; gc.collect() did not recover it, the leak is server-side).
The suite therefore shells out to this module once per rung: a fresh
PJRT client per attempt makes the ladder deterministic.

Usage: python -m benchmarks.maxt_row N T [max_iter]
Prints one JSON line on stdout; rc=0 on success, rc=3 on OOM
(anything else is a real bug and surfaces as its own rc/traceback).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    n, t = int(sys.argv[1]), int(sys.argv[2])
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 60

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache_suite"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from picard_ica_tpu.models.core import CoreOptions, run_core_jit_donated
    from picard_ica_tpu.ops.densities import Tanh
    from picard_ica_tpu.ops.whitening import center_whiten
    from picard_ica_tpu.utils.datagen import generate_bench_data_device

    opts = CoreOptions(
        density=Tanh(), ortho=True, extended=True, has_cov=True,
        m=7, ls_tries=10, use_pallas=True, kernel_precision="auto",
        donate_data=True,
    )
    cov = jnp.eye(n, dtype=jnp.float32)

    def whitened():
        x = generate_bench_data_device(n, t)
        xw, _, _ = center_whiten(x, n)
        jax.block_until_ready(xw)
        return xw  # the mixture frees on return

    def is_oom(e: Exception) -> bool:
        msg = f"{type(e).__name__}: {e}".lower()
        return any(tok in msg for tok in (
            "resource_exhausted", "out of memory", "oom", "allocat", "hbm"))

    try:
        res = run_core_jit_donated(whitened(), cov, 1e-7, 0.01, max_iter, opts)
        jax.block_until_ready(res)  # compile + warm (consumes its input)
        del res
        xw = whitened()
        t0 = time.perf_counter()
        res = run_core_jit_donated(xw, cov, 1e-7, 0.01, max_iter, opts)
        jax.block_until_ready(res)
        wall = time.perf_counter() - t0
    except Exception as e:  # OOM -> rc=3 for the ladder; else re-raise
        if not is_oom(e):
            raise
        print(json.dumps({"oom": True, "n": n, "t": t,
                          "error": f"{type(e).__name__}"}))
        return 3

    iters = int(res.n_iterations)
    print(json.dumps({
        "n": n, "t": t,
        "samples_per_s": t * iters / wall, "iters": iters,
        "converged": bool(res.converged),
        "gradient_norm": float(res.gradient_norm), "wall_s": wall,
        # for the suite's _roofline_fracs MFU/HBM columns
        "stage_ls_calls": [int(v) for v in list(res.stage_ls_calls)],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
