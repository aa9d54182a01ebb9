"""Trace-derived device cost of the hot fused step at large N.

Evidence harness for the large-N design decision (docs/ROADMAP.md
item 3): the fused Pallas line-search kernel compile-caps at N=512
(delta) / 576 (plain); above that the core falls back to the XLA path
(models/core.py:389-422 — the same contractions the reference issues
through BLAS GEMM for any N, core.rs:218,274). The claim to verify on
hardware is that at those sizes the XLA path already sits at the MXU
roofline for its dot precision, i.e. a streaming-W Pallas kernel
(which must execute the same GEMMs) has no headroom beyond the
elementwise/HBM savings.

For each requested N this measures, from jax.profiler device traces
(wall clock is unreliable through the TPU tunnel — see
utils/profiling.device_trace_summary):

  * XLA delta-mode fused step (3 GEMMs of 2*N^2*T at HIGHEST) and
    plain mode (2 GEMMs), per-call device ms;
  * the Pallas fused kernel at the same shape when N is under the cap
    (f32 tier, delta + plain), for a direct crossover comparison;
  * achieved TFLOP/s on the GEMM work alone and the fraction of the
    v5e MXU peak for the dot precision in use, plus the HBM-roofline
    floor — the two ceilings that bound any implementation.

Usage:
    python benchmarks/large_n_trace.py --configs 512:200000 1024:100000 \
        [--reps 2] [--json OUT] [--cpu]

Output: one JSON document {"rows": [...]} (stdout or --json), with a
human summary on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.roofline import (  # noqa: E402 - after sys.path insert
    HBM_BYTES_PER_S,
    PEAK_BF16,
    PEAK_HIGHEST,
)


def _measure(fn, args, reps: int, device_substr: str) -> float:
    """Per-call device time (ms) of ``fn(*args)`` from a profiler trace."""
    import jax

    from picard_ica_tpu.utils.profiling import device_trace_summary

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm outside the trace
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]  # real sync
        summary = device_trace_summary(td, device_substr=device_substr)
    return summary["total_us"] / 1e3 / reps


def run_config(n: int, t: int, reps: int, device_substr: str) -> list:
    import jax
    import jax.numpy as jnp

    from picard_ica_tpu.models.core import CoreOptions, data_fused_step
    from picard_ica_tpu.ops.densities import Tanh
    from picard_ica_tpu.ops.pallas_kernels import (
        _stream_dims,
        max_fused_n,
        max_streaming_n,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
    w_old = jnp.eye(n, dtype=jnp.float32)
    w_new = w_old + jnp.asarray(
        0.01 * rng.standard_normal((n, n)).astype(np.float32))
    jax.block_until_ready(x)

    rows = []
    for path in ("xla", "pallas"):
        for mode in ("delta", "plain"):
            streaming = False
            if path == "pallas":
                if jax.default_backend() != "tpu":
                    continue
                streaming = n > max_fused_n(absolute_ll=(mode == "plain"))
                if streaming and n > max_streaming_n(need_h=False):
                    continue
            opts = CoreOptions(
                density=Tanh(), ortho=True, extended=True, has_cov=True,
                m=7, ls_tries=10,
                use_pallas=(path == "pallas"),
                kernel_precision="f32",
                plain_ls=(mode == "plain"),
            )
            fn = jax.jit(
                lambda mn, mo, xx, o=opts: data_fused_step(
                    mn, mo, xx, o, need_h=False, need_ysq=True))
            ms = _measure(fn, (w_new, w_old, x), reps, device_substr)

            n_gemms = 3 if (path == "xla" and mode == "delta") else 2
            if path == "pallas":
                # in-kernel rotates: y_old+dy (delta) or y_new (plain),
                # plus the psi @ y^T contraction
                n_gemms = 3 if mode == "delta" else 2
            gemm_flops = n_gemms * 2.0 * n * n * t
            achieved = gemm_flops / (ms * 1e-3)
            # minimum HBM traffic: pallas streams X once; the XLA path
            # reads X per rotate GEMM and materializes/rereads Y-sized
            # intermediates (delta: y_old, dy write + read for psi/g).
            # The streaming-W variant additionally re-reads the weight
            # row blocks per x tile and emits grouped G partials.
            x_bytes = 4.0 * n * t
            if path == "pallas":
                hbm_bytes = x_bytes
                if streaming:
                    bt, npad = _stream_dims(
                        n, need_h=False,
                        absolute_ll=(mode == "plain"))
                    n_tiles = -(-t // bt)
                    n_w = 1 if mode == "plain" else 2
                    hbm_bytes += (
                        n_w * 4.0 * npad * n * n_tiles       # W stream
                        + 4.0 * npad * npad * -(-n_tiles // 16) * 2
                    )                                         # G partials
            else:
                hbm_bytes = (
                    (2 + 4) * x_bytes if mode == "delta" else 3 * x_bytes)
            rows.append({
                "n": n, "t": t,
                "path": "pallas-stream" if streaming else path,
                "mode": mode,
                "device_ms_per_call": ms,
                "gemm_tflops_achieved": achieved / 1e12,
                "frac_of_highest_peak": achieved / PEAK_HIGHEST,
                "frac_of_bf16_peak": achieved / PEAK_BF16,
                "mxu_roofline_ms": gemm_flops / PEAK_HIGHEST * 1e3,
                "hbm_roofline_ms": hbm_bytes / HBM_BYTES_PER_S * 1e3,
            })
            r = rows[-1]
            print(
                f"N={n} T={t} {r['path']}/{mode}: {ms:8.2f} ms/call  "
                f"{r['gemm_tflops_achieved']:6.2f} TF/s "
                f"({r['frac_of_highest_peak']*100:5.1f}% of HIGHEST peak; "
                f"rooflines mxu {r['mxu_roofline_ms']:.2f} / "
                f"hbm {r['hbm_roofline_ms']:.2f} ms)",
                file=sys.stderr, flush=True,
            )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["512:200000", "1024:100000"],
                    help="N:T pairs")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_suite"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    device_substr = "TPU" if jax.default_backend() == "tpu" else "CPU"
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rows = []
    for spec in args.configs:
        n, t = (int(v) for v in spec.split(":"))
        t0 = time.time()
        rows.extend(run_config(n, t, args.reps, device_substr))
        print(f"config {spec} done in {time.time()-t0:.0f}s", file=sys.stderr)
        if args.json:
            # Flush after every config: a remote-compile hang on a later
            # (bigger) config must not wipe the rows already measured.
            with open(args.json, "w") as f:
                json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                          indent=2)

    out = {"backend": jax.default_backend(), "rows": rows}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    else:
        json.dump(out, sys.stdout, indent=2)
        print()


if __name__ == "__main__":
    main()
