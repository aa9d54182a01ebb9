"""Full benchmark suite for picard_ica_tpu.

Reproduces the reference's criterion benchmark grid (reference:
benches/benchmarks.rs:37-141) plus this project's BASELINE.json config
matrix, on whatever backend JAX selects (the real TPU chip under the
driver; CPU with --cpu).

Groups (mirroring benches/benchmarks.rs):
  * picard_default        — full `fit` wall-time, T in {1k,5k,10k} x N in {10,50,100}
  * picard_n_components   — N=50, T=5k, k in {5,10,25,50}, max_iter=100
  * picard_ortho          — ortho in {false,true}, k=25, N=50, T=5k
  * picard_extended       — extended in {false,true}, k=25, N=50, T=5k

BASELINE.json configs (grad-loop samples/s/chip + iters-to-tol + Amari):
  1. 8 x 10k Laplace, tanh, whitened (the criterion case)
  2. Picard-O 32 x 100k super-Gaussian
  3. extended 64 x 500k mixed sub+super, cube + tanh
  4. JADE(50) warm start -> Picard, 128 x 1M distinct-kurtosis
  5. EEG/MEG-scale 256 x T extended+ortho (T scaled to single-chip HBM
     here; the multi-host sharding path itself is exercised by
     __graft_entry__.dryrun_multichip and tests/test_sharding.py)

Data: the reference harness's LCG Laplace generator (bit-identical
stream via the native C++ module) so timings are measured on the same
mixtures the Rust criterion benches use.

A sixth group, ``oracle_conformance``, measures the BASELINE accuracy
target where it is meaningful (T >= 100k; see group docstring).

Usage:
    python benchmarks/suite.py [--quick] [--cpu] [--json OUT.json]
                               [--group {criterion,n_components,ortho,large_n,
                                         extended,baseline,conformance}]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Runnable from anywhere: the package lives at the repo root.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

# The f64 C++ oracle is deterministic and single-threaded — minutes per
# call at T >= 500k on this box's one core — and its result depends only
# on the input bytes, the solver params, and the oracle source itself.
# Caching its fixed points on disk (gitignored .bench_cache/) means a
# TPU-session suite run pays chip time only; set
# PICARD_SUITE_ORACLE_CACHE=0 to force recomputation.
_ORACLE_CACHE = os.environ.get("PICARD_SUITE_ORACLE_CACHE", "1") != "0"
# Stored fields only (no "y": the (n, t) source estimate would bloat the
# cache and no suite row reads it).
_ORACLE_FIELDS = ("w", "signs", "n_iterations", "converged", "gradient_norm")


def _oracle_core_cached(x, covariance, **kw):
    """``native.oracle_core`` with an on-disk result cache.

    Returns the oracle dict minus ``y``. The cache key hashes the input
    bytes, the covariance (presence + bytes), every solver kwarg, AND
    the oracle's C++ source — editing ``native/src/oracle.cpp``
    invalidates stale entries automatically (the lockstep invariant in
    CLAUDE.md: oracle semantics move with models/core.py).
    """
    import hashlib

    from picard_ica_tpu import native

    x = np.ascontiguousarray(x, np.float64)
    h = hashlib.sha256()
    h.update(repr(("oracle_core/v1", x.shape, sorted(kw.items()),
                   covariance is not None)).encode())
    h.update(x.tobytes())
    if covariance is not None:
        h.update(np.ascontiguousarray(covariance, np.float64).tobytes())
    try:
        with open(os.path.join(_REPO_ROOT, "picard_ica_tpu", "native", "src",
                               "oracle.cpp"), "rb") as f:
            h.update(f.read())
    except OSError:
        pass
    path = os.path.join(_REPO_ROOT, ".bench_cache",
                        f"oracle_{h.hexdigest()[:24]}.npz")
    if _ORACLE_CACHE and os.path.exists(path):
        with np.load(path) as z:
            return {
                "w": z["w"], "signs": z["signs"],
                "n_iterations": int(z["n_iterations"]),
                "converged": bool(z["converged"]),
                "gradient_norm": float(z["gradient_norm"]),
            }
    res = native.oracle_core(x, covariance, **kw)
    out = {k: res[k] for k in _ORACLE_FIELDS}
    if _ORACLE_CACHE:
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, **out)
            os.replace(tmp, path)
        except OSError as e:  # cache is best-effort
            print(f"oracle cache write failed: {e}", file=sys.stderr)
    return out


def _fit_once(x, config):
    import jax

    from picard_ica_tpu import Picard

    result = Picard.fit(x, config)
    jax.block_until_ready(result.sources)
    return result


def _time_fit(x, config, reps: int) -> tuple:
    """(best wall seconds, result) over ``reps`` runs (first run warms
    the compile cache and is excluded)."""
    result = _fit_once(x, config)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = _fit_once(x, config)
        best = min(best, time.perf_counter() - t0)
    return best, result


def _bench_data(n, t, seed=42):
    from picard_ica_tpu.utils.datagen import generate_bench_data

    return generate_bench_data(n, t, seed=seed).astype(np.float32)


def _mixed_data(n, t, seed=42):
    from picard_ica_tpu.utils.datagen import generate_mixed_kurtosis_data

    _, mixing, x = generate_mixed_kurtosis_data(n, t, seed)
    return x.astype(np.float32), mixing


def group_criterion_grid(records, reps, quick):
    """benches/benchmarks.rs:37-56 — full default fit."""
    from picard_ica_tpu import PicardConfig

    sizes = [1000, 5000, 10000]
    comps = [10, 50] if quick else [10, 50, 100]
    for t in sizes:
        for n in comps:
            x = _bench_data(n, t)
            # Reference defaults: tol=1e-7, max_iter=500 (config.rs:64-85) —
            # reachable in f32 via the fused kernels + staged precision.
            cfg = PicardConfig(random_state=42, max_iter=500, tol=1e-7)
            secs, res = _time_fit(x, cfg, reps)
            records.append({
                "group": "picard_default", "n": n, "t": t,
                "wall_s": secs, "iters": res.n_iterations,
                "converged": res.converged,
            })
            print(f"picard_default n={n} t={t}: {secs*1e3:.1f} ms "
                  f"({res.n_iterations} iters)", file=sys.stderr)


def group_n_components(records, reps):
    """benches/benchmarks.rs:58-80."""
    from picard_ica_tpu import PicardConfig

    n, t = 50, 5000
    x = _bench_data(n, t)
    for k in [5, 10, 25, 50]:
        cfg = PicardConfig(n_components=k, max_iter=100, random_state=42, tol=1e-7)
        secs, res = _time_fit(x, cfg, reps)
        records.append({
            "group": "picard_n_components", "n": n, "t": t, "k": k,
            "wall_s": secs, "iters": res.n_iterations,
        })
        print(f"picard_n_components k={k}: {secs*1e3:.1f} ms", file=sys.stderr)


def group_ortho(records, reps):
    """benches/benchmarks.rs:82-104."""
    from picard_ica_tpu import PicardConfig

    n, t = 50, 5000
    x = _bench_data(n, t)
    for ortho in [False, True]:
        cfg = PicardConfig(n_components=25, ortho=ortho, max_iter=100,
                           random_state=42, tol=1e-7)
        secs, res = _time_fit(x, cfg, reps)
        records.append({
            "group": "picard_ortho", "ortho": ortho,
            "wall_s": secs, "iters": res.n_iterations,
        })
        print(f"picard_ortho ortho={ortho}: {secs*1e3:.1f} ms", file=sys.stderr)


def group_extended(records, reps):
    """benches/benchmarks.rs:106-128."""
    from picard_ica_tpu import PicardConfig

    n, t = 50, 5000
    x = _bench_data(n, t)
    for extended in [False, True]:
        cfg = PicardConfig(n_components=25, extended=extended, max_iter=100,
                           random_state=42, tol=1e-7)
        secs, res = _time_fit(x, cfg, reps)
        records.append({
            "group": "picard_extended", "extended": extended,
            "wall_s": secs, "iters": res.n_iterations,
        })
        print(f"picard_extended ext={extended}: {secs*1e3:.1f} ms", file=sys.stderr)


from benchmarks.roofline import (  # noqa: E402 - after sys.path insert
    HBM_BYTES_PER_S as _HBM_BYTES_PER_S,
    MXU_PASSES as _MXU_PASSES,
    PEAK_BF16 as _PEAK_BF16,
)


def _roofline_fracs(rec, res, opts, n, t):
    """Attach fit-level MFU/roofline columns (VERDICT r2 item 4).

    Model: the mandatory GEMM work of the fit, in bf16-pass
    equivalents — per fused line-search call, `ops` N x T GEMMs of
    2*N^2*T flops (delta: rotate y_old + rotate dy + contract G;
    plain: rotate + contract; +1 H contraction when non-ortho needs
    it), weighted by the tier's MXU pass count — divided by the
    measured time and the chip's bf16 peak. The HBM column counts one
    X read per call (bf16 tier reads the half-width copy); the XLA
    fallback path is charged its materialized-Y traffic (~6 X-sized
    transfers per delta call, see benchmarks/large_n_trace.py).
    Excludes the one-time standalone moment pass and all N x N algebra
    (a few % at headline scale): this is the COMPUTE floor the fit
    cannot go below, so the fraction is an upper bound on remaining
    headroom.
    """
    import jax

    from picard_ica_tpu.models.core import _precision_stages

    if jax.default_backend() != "tpu":
        return  # the peaks are v5e numbers; CPU fractions are noise
    cum = getattr(res, "stage_ls_calls", None)
    if cum is None:
        return
    cum = [int(v) for v in np.asarray(cum)]
    per_stage = [c - p for c, p in zip(cum, [0] + cum[:-1])]
    stages = [p for p, _ in _precision_stages(opts)]
    h_ops = 1 if (not opts.ortho) else 0
    flops = 0.0
    xbytes = 0.0
    for idx, (prec, calls) in enumerate(zip(stages, per_stage)):
        if calls <= 0:
            continue
        final = idx == len(stages) - 1
        plain = opts.use_pallas and prec == "bf16" and not final
        ops = (2 if plain else 3) + h_ops
        if not opts.use_pallas:
            ops = 3 + h_ops  # XLA delta path
        flops += calls * ops * 2.0 * n * n * t * _MXU_PASSES.get(prec, 6)
        if opts.use_pallas:
            xbytes += calls * (2.0 if plain else 4.0) * n * t
        else:
            xbytes += calls * 6 * 4.0 * n * t
    elapsed = rec.get("device_s") or rec["wall_s"]
    if elapsed <= 0 or flops == 0:
        return
    rec["mxu_frac_of_bf16_peak"] = flops / elapsed / _PEAK_BF16
    rec["hbm_frac_of_peak"] = xbytes / elapsed / _HBM_BYTES_PER_S
    rec["roofline_model"] = "gemm-only bf16-pass equivalents"


def _core_throughput(x_np, n, tol, max_iter, opts_kw, reps,
                     prewhitened=False):
    """Grad-loop samples/s of the jitted core on whitened data.

    ``prewhitened=True`` skips the center+whiten step — used by rows
    whose data is too large to hold mixture + whitened copies at once
    (the caller whitens and frees the mixture first).
    """
    import jax
    import jax.numpy as jnp

    from picard_ica_tpu.models.core import CoreOptions, run_core_jit
    from picard_ica_tpu.ops.whitening import center_whiten

    if prewhitened:
        xw = jnp.asarray(x_np)
    else:
        xw, _, _ = center_whiten(jnp.asarray(x_np), n)
    np.asarray(xw[:1, :1])  # real sync (early block_until_ready here)
    t = xw.shape[1]

    opts = CoreOptions(**opts_kw)
    cov = jnp.eye(n, dtype=xw.dtype) if opts.has_cov else jnp.zeros((n, n), xw.dtype)
    res = run_core_jit(xw, cov, tol, 0.01, max_iter, opts)
    jax.block_until_ready(res)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run_core_jit(xw, cov, tol, 0.01, max_iter, opts)
        jax.block_until_ready(res)
        best = min(best, time.perf_counter() - t0)
    iters = int(res.n_iterations)
    rec = {
        "samples_per_s": t * iters / best,
        "iters": iters,
        "converged": bool(res.converged),
        "gradient_norm": float(res.gradient_norm),
        "wall_s": best,
    }
    if best < 0.35:
        # This environment dispatches through a TPU tunnel with ~35 ms
        # fixed per-launch overhead plus per-stage launch costs
        # (CLAUDE.md): sub-350 ms walls measure mostly the tunnel, not
        # the chip (round-4 check: 64x500k walls ~230 ms carry < 100 ms
        # of device time). Re-measure on-device time from a profiler
        # trace and make THAT the row's headline number — a wall-clock
        # rate here would anchor readers to the tunnel, not the
        # hardware.
        rec["overhead_bound"] = True
        try:
            import tempfile

            from picard_ica_tpu.utils.profiling import device_trace_summary

            with tempfile.TemporaryDirectory() as td:
                with jax.profiler.trace(td):
                    res = run_core_jit(xw, cov, tol, 0.01, max_iter, opts)
                    jax.block_until_ready(res)
                    np.asarray(xw[:1, :1])  # real sync inside the trace
                dsub = "TPU" if jax.default_backend() == "tpu" else "CPU"
                device_s = device_trace_summary(td, dsub)["total_us"] / 1e6
            rec["device_s"] = device_s
            rec["samples_per_s_device"] = t * iters / device_s
            rec["samples_per_s"] = rec["samples_per_s_device"]
        except Exception as e:  # pragma: no cover - trace plumbing
            print(f"device-trace remeasure failed: {e}", file=sys.stderr)
    _roofline_fracs(rec, res, opts, n, t)
    return rec


def _maxt_ladder(records, core_kw, ladder=(6_000_000, 5_000_000, 4_000_000)):
    """baseline_5 max-T capability ladder, one fresh subprocess per
    rung (see benchmarks/maxt_row.py for why isolation is load-
    bearing). Factored out so the OOM step-down / failure-record
    semantics are unit-testable with a mocked subprocess.
    """
    import subprocess

    n = 256

    # Each rung runs in a FRESH subprocess (benchmarks/maxt_row.py):
    # the row measures what one chip can HOLD, which needs an
    # unfragmented arena and a clean donation state. Round-5
    # measurement: after an in-process 6M rung OOM'd mid-donated-
    # execution, 4M (which fits fresh with ~4 GB of headroom) and
    # even a plain 2 GB transfer OOM'd too — gc.collect() does not
    # recover the arena, the leak is on the PJRT server side. Only
    # an OOM (rc=3) steps the ladder down; any other failure is a
    # real bug and fails the group.
    class _ShimRes:
        def __init__(self, stage_ls_calls):
            self.stage_ls_calls = stage_ls_calls

    from picard_ica_tpu.models.core import CoreOptions

    opts = CoreOptions(**dict(core_kw, donate_data=True))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = None
    for t in ladder:
        proc = subprocess.run(
            [sys.executable, "-m", "benchmarks.maxt_row",
             str(n), str(t), "60"],
            capture_output=True, text=True, timeout=1500, cwd=repo,
        )
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode == 3:
            print(f"baseline 5 max-T: 256x{t} did not fit "
                  f"(fresh process); stepping down", file=sys.stderr)
            continue
        if proc.returncode != 0:
            raise RuntimeError(
                f"maxt_row 256x{t} failed rc={proc.returncode}: "
                f"{proc.stderr[-500:]}")
        r = json.loads(proc.stdout.strip().splitlines()[-1])
        _roofline_fracs(
            r, _ShimRes(r.pop("stage_ls_calls", None)), opts, n, t)
        records.append({"group": "baseline_5_max_t_single_chip", **r})
        print(f"baseline 5 max-T ({n}x{t} ext+ortho): "
              f"{r['samples_per_s']:.3e} samples/s ({r['iters']} iters)",
              file=sys.stderr)
        break
    if r is None:
        # Every rung OOM'd: leave an explicit failed record so the
        # regression is visible in the JSON instead of a silently
        # missing row (ADVICE r4).
        records.append({"group": "baseline_5_max_t_single_chip", "n": n,
                        "failed": True,
                        "reason": f"all T rungs OOM'd: {list(ladder)}"})
        print("baseline 5 max-T: every T rung OOM'd; recorded as failed",
              file=sys.stderr)


def group_baseline_configs(records, reps, quick):
    """The five BASELINE.json configs."""
    import jax

    from picard_ica_tpu import Picard, PicardConfig
    from picard_ica_tpu.ops.densities import Tanh
    from picard_ica_tpu.utils.datagen import _lcg_stream, _lcg_uniform
    from picard_ica_tpu.utils.metrics import amari_distance

    on_tpu = jax.default_backend() == "tpu"
    tol = 1e-7

    def mixing_of(n, t, seed=42):
        states, state = _lcg_stream(seed, n * t)
        states, _ = _lcg_stream(state, n * n)
        return _lcg_uniform(states).reshape(n, n) - 0.5

    # Config 1: 8 x 10k, full fit + Amari vs ground truth AND vs the
    # native f64 oracle (the BASELINE "Amari < 1e-3 vs reference"
    # metric: the oracle is the reference-semantics f64 ground truth).
    n, t = 8, 10_000
    x = _bench_data(n, t)
    cfg = PicardConfig(random_state=42, tol=1e-7)  # reference default tol
    secs, res = _time_fit(x, cfg, reps)
    amari = amari_distance(np.asarray(res.full_unmixing()), mixing_of(n, t))
    rec = {
        "group": "baseline_1_small_fit", "n": n, "t": t, "wall_s": secs,
        "iters": res.n_iterations, "amari_vs_truth": amari,
    }
    from picard_ica_tpu import native

    if native.available():
        from picard_ica_tpu.utils.datagen import generate_bench_data

        xc, _ = native.oracle_center(
            np.asarray(generate_bench_data(n, t, seed=42), np.float64)
        )
        xw, k_o = native.oracle_whiten(xc, n)
        res_o = _oracle_core_cached(xw, np.eye(n), max_iter=500, tol=1e-7)
        w_full_oracle = res_o["w"] @ k_o
        # Default-config fit vs the oracle: at T=10k the empirical loss
        # has multiple shallow near-optima, so this row partly measures
        # basin choice (trajectory-dependent).
        rec["amari_vs_oracle"] = amari_distance(
            np.asarray(res.full_unmixing()), np.linalg.pinv(w_full_oracle)
        )
        # Matched-start pinned-f32 fit: quantifies the f32 basin spread
        # specifically (identity init removes the RNG variable). At
        # T=10k the near-optima sit ~1e-3 Amari apart and f32-vs-f64
        # trajectories fork chaotically mid-run, so BOTH f32 rows
        # measure basin choice. EXACT trajectory conformance to the
        # reference-semantics oracle (Amari < 1e-9, identical iteration
        # counts) is established at f64 by tests/test_native.py.
        res_m = Picard.fit(x, PicardConfig(
            random_state=42, tol=1e-7, w_init=np.eye(n),
            kernel_precision="f32",
        ))
        rec["amari_vs_oracle_matched_f32"] = amari_distance(
            np.asarray(res_m.full_unmixing()), np.linalg.pinv(w_full_oracle)
        )
    records.append(rec)
    print(f"baseline 1 (8x10k fit): {secs*1e3:.1f} ms amari={amari:.2e} "
          f"amari_vs_oracle={rec.get('amari_vs_oracle', float('nan')):.2e} "
          f"matched={rec.get('amari_vs_oracle_matched_f32', float('nan')):.2e}",
          file=sys.stderr)

    core_kw = dict(density=Tanh(), ortho=True, extended=True, has_cov=True,
                   m=7, ls_tries=10, use_pallas=on_tpu,
                   kernel_precision="auto")

    # Config 2: Picard-O 32 x 100k.
    n, t = 32, 100_000
    r = _core_throughput(_bench_data(n, t), n, tol, 200, core_kw, reps)
    records.append({"group": "baseline_2_picard_o", "n": n, "t": t, **r})
    print(f"baseline 2 (32x100k): {r['samples_per_s']:.3e} samples/s "
          f"({r['iters']} iters, gnorm {r['gradient_norm']:.1e})", file=sys.stderr)

    # Config 3: extended 64 x 500k mixed sub+super — run with BOTH the
    # default tanh AND the cube density (BASELINE.json: "cube+tanh").
    from picard_ica_tpu.ops.densities import Cube

    n, t = 64, 500_000
    x, mixing = _mixed_data(n, t)
    r = _core_throughput(x, n, tol, 200, core_kw, reps)
    records.append({"group": "baseline_3_extended_mixed", "n": n, "t": t,
                    "density": "tanh", **r})
    print(f"baseline 3 (64x500k ext, tanh): {r['samples_per_s']:.3e} samples/s "
          f"({r['iters']} iters)", file=sys.stderr)
    cube_kw = dict(core_kw, density=Cube())
    r = _core_throughput(x, n, tol, 200, cube_kw, reps)
    records.append({"group": "baseline_3_extended_mixed", "n": n, "t": t,
                    "density": "cube", **r})
    print(f"baseline 3 (64x500k ext, cube): {r['samples_per_s']:.3e} samples/s "
          f"({r['iters']} iters, gnorm {r['gradient_norm']:.1e})",
          file=sys.stderr)
    # Exp at the same scale, so all three densities carry a committed
    # throughput number (VERDICT r4 #8; exp conformance at 32x100k is
    # in the oracle group — this is the perf side, density.rs:72-103).
    from picard_ica_tpu.ops.densities import Exp

    exp_kw = dict(core_kw, density=Exp())
    r = _core_throughput(x, n, tol, 200, exp_kw, reps)
    records.append({"group": "baseline_3_extended_mixed", "n": n, "t": t,
                    "density": "exp", **r})
    print(f"baseline 3 (64x500k ext, exp): {r['samples_per_s']:.3e} samples/s "
          f"({r['iters']} iters, gnorm {r['gradient_norm']:.1e})",
          file=sys.stderr)

    # Config 4: JADE(50) warm start -> Picard, 128 x 1M. f64 input so
    # the facade's host-f64 preprocessing runs (reference-parity
    # pipeline), plus an oracle cross-check from the SAME warm start.
    from picard_ica_tpu.utils.datagen import generate_mixed_kurtosis_data

    n, t = (64, 200_000) if quick else (128, 1_000_000)
    _, mixing, x64 = generate_mixed_kurtosis_data(n, t, seed=7)
    cfg = PicardConfig(jade_it=50, random_state=0, tol=1e-7, max_iter=200)
    secs, res = _time_fit(x64, cfg, 1)
    amari = amari_distance(np.asarray(res.full_unmixing()), mixing)
    rec = {
        "group": "baseline_4_jade_warm", "n": n, "t": t, "wall_s": secs,
        "iters": res.n_iterations, "amari_vs_truth": amari,
    }
    if native.available() and not quick:
        import jax.numpy as jnp

        from picard_ica_tpu.models.jade import jade_jit
        from picard_ica_tpu.ops.whitening import preprocess_f64

        data_h, _, k_h = preprocess_f64(x64, n, True, True)
        w_init, _ = jade_jit(
            jnp.asarray(data_h.astype(np.float32)), 50, 1e-6, False
        )
        w_init64 = np.asarray(w_init, np.float64)
        res_o = _oracle_core_cached(
            w_init64 @ data_h, np.eye(n), ortho=True, extended=True,
            max_iter=200, tol=1e-7,
        )
        w_o = res_o["w"] @ w_init64 @ k_h
        rec["amari_oracle_vs_truth"] = amari_distance(w_o, mixing)
        rec["amari_vs_oracle_matched_start"] = "see oracle_conformance"
    records.append(rec)
    print(f"baseline 4 (JADE->{n}x{t}): {secs:.2f} s amari={amari:.2e} "
          f"oracle_floor={rec.get('amari_oracle_vs_truth', float('nan')):.2e}",
          file=sys.stderr)
    # Release config 4's device buffers (PicardResult holds the
    # 128x1M sources, ~0.5 GB) before config 5's 12.3 GB datagen+
    # whiten peak: a round-5 run with them still referenced OOM'd
    # every max-T rung AND the eeg row's 2 GB transfer — the arena
    # needs every byte and an un-collected cycle can pin buffers.
    import gc

    del res
    gc.collect()

    # Config 5 at single-chip max T. Full scale is 256 x 10M across a
    # multi-host mesh (T shards linearly, one ~17 KB psum per pass);
    # this row runs the largest T one v5e chip holds. Measured memory
    # anatomy (round 4, chip-probed): the refinement re-projection and
    # the solver pre-rotation run IN PLACE (ops/linalg.
    # rotate_rows_inplace), the grouped-partials fused kernel writes
    # ~16x fewer moment partials, and the donated core aliases the
    # result Y onto X — leaving datagen/whitening's 2 live f32 (N, T)
    # copies (12.3 GB at T=6M) as the binding peak; T=7M (14.3 GB)
    # is past the ~15.75 GB arena's comfort. The donated entry
    # consumes its input, so the timed run regenerates the
    # (deterministic, seeded) mixture after the compile/warmup run.
    if on_tpu and not quick:
        _maxt_ladder(records, core_kw)

    # Config 5: EEG/MEG-scale 256 x T, extended+ortho. T picked for
    # single-chip HBM (f32 X at 256 x 10M = 10.2 GB; we run 2M/chip
    # here and the samples axis shards linearly across chips). Runs
    # AFTER the max-T row: the 12.3 GB datagen+whiten peak above needs
    # an un-fragmented arena — sequenced after this row's buffers it
    # OOM'd on the same chip that runs it clean in a fresh process.
    n, t = (128, 500_000) if quick else (256, 2_000_000)
    if not quick:
        import gc

        gc.collect()  # same arena-pressure rationale as the max-T row
    r = _core_throughput(_bench_data(n, t), n, tol, 60, core_kw, reps=1)
    records.append({"group": "baseline_5_eeg_scale", "n": n, "t": t, **r})
    print(f"baseline 5 ({n}x{t} ext+ortho): {r['samples_per_s']:.3e} samples/s "
          f"({r['iters']} iters)", file=sys.stderr)


def group_large_n(records, reps, quick):
    """Streaming-W fused path beyond the resident kernels' N=512/576
    cap (round 3): the committed evidence that the fused path scales
    (VERDICT r2 missing #2). Capped at max_iter=10 / tol=1e-4: at
    N=1024 one jitted core call must stay under this environment's
    ~2-minute device-time watchdog, and the row's purpose is per-
    iteration throughput, not convergence (conformance is covered at
    the oracle group's sizes)."""
    import jax

    from picard_ica_tpu.ops.densities import Tanh
    from picard_ica_tpu.ops.pallas_kernels import max_fused_n, max_streaming_n

    on_tpu = jax.default_backend() == "tpu"
    n, t = (640, 100_000) if quick else (1024, 200_000)
    if not on_tpu:
        print("large_n group needs the TPU backend; skipping", file=sys.stderr)
        return
    for use_pallas, label in ((True, "pallas-stream"), (False, "xla")):
        if use_pallas and n > max_streaming_n(need_h=False):
            continue
        kw = dict(density=Tanh(), ortho=True, extended=True, has_cov=True,
                  m=7, ls_tries=10, use_pallas=use_pallas,
                  kernel_precision="auto")
        r = _core_throughput(_bench_data(n, t), n, 1e-4, 10, kw, reps=1)
        records.append({
            "group": "large_n", "n": n, "t": t, "path": label,
            "resident_cap": max_fused_n(), **r,
        })
        print(f"large_n ({n}x{t} {label}): {r['samples_per_s']:.3e} "
              f"samples/s ({r['iters']} iters)", file=sys.stderr)


def group_oracle_conformance(records):
    """The BASELINE accuracy target, measured where it is meaningful.

    Amari distance of the f32 TPU solver vs the f64 native oracle
    (reference semantics; stands in for the absent Rust toolchain) on
    the bench mixtures at T >= 100k. At small T (the 8x10k criterion
    mixture) the empirical loss has several near-optima ~1e-3 apart and
    any cross-precision comparison measures basin choice; at T >= 100k
    the basins merge and the row measures solver accuracy. Both solvers
    start from W_init = I on their own whitening of the same f64 data
    (whitening matrices agree to ~1e-7, tests/test_native.py:67-78).

    Target (BASELINE.md): every row < 1e-3.
    """
    from picard_ica_tpu import Picard, PicardConfig, native
    from picard_ica_tpu.utils.metrics import amari_distance

    if not native.available():
        print("oracle unavailable; skipping conformance group", file=sys.stderr)
        return

    from picard_ica_tpu.ops.densities import Cube, Exp, Tanh

    densities = {"tanh": Tanh(), "exp": Exp(), "cube": Cube()}
    cases = [
        # (label, n, t, mixed_kurtosis, ortho, extended, density)
        ("criterion_8x100k", 8, 100_000, False, True, True, "tanh"),
        ("picard_o_32x100k", 32, 100_000, False, True, True, "tanh"),
        ("extended_64x500k", 64, 500_000, True, True, True, "tanh"),
        # Non-tanh large-T conformance (BASELINE config 3 is
        # "cube+tanh"; exp covers the third density at scale —
        # density.rs:85-130 semantics vs the oracle's f64 run).
        ("exp_32x100k", 32, 100_000, False, True, True, "exp"),
        ("cube_64x500k", 64, 500_000, True, True, True, "cube"),
    ]
    for label, n, t, mixed, ortho, extended, dens in cases:
        if mixed:
            from picard_ica_tpu.utils.datagen import generate_mixed_kurtosis_data

            _, _, x64 = generate_mixed_kurtosis_data(n, t, seed=42)
        else:
            from picard_ica_tpu.utils.datagen import generate_bench_data

            x64 = np.asarray(generate_bench_data(n, t, seed=42), np.float64)

        t0 = time.perf_counter()
        xc, _ = native.oracle_center(x64)
        xw, k_o = native.oracle_whiten(xc, n)
        res_o = _oracle_core_cached(
            xw, np.eye(n) if extended else None, density=dens,
            ortho=ortho, extended=extended, max_iter=500, tol=1e-7,
        )
        oracle_s = time.perf_counter() - t0
        w_full_oracle = res_o["w"] @ k_o

        cfg = PicardConfig(
            density=densities[dens], ortho=ortho, extended=extended,
            tol=1e-7, max_iter=500, w_init=np.eye(n),
        )
        # f64 input -> the facade's host-f64 preprocessing (the
        # reference-parity pipeline); the core runs f32 on device.
        t0 = time.perf_counter()
        res = Picard.fit(x64, cfg)
        fit_s = time.perf_counter() - t0
        amari = amari_distance(
            np.asarray(res.full_unmixing()), np.linalg.pinv(w_full_oracle)
        )
        # All-f32 pipeline (device whitening) for transparency: the f32
        # covariance's eigengap-amplified K rotation perturbs the data
        # percent-level, which in chaotic extended mode can land in a
        # different (reference-reachable) stationary point — the
        # matched-input solver conformance itself is ~1e-12 (see
        # tests/test_native.py and docs/DESIGN.md §7).
        res_dev = Picard.fit(x64.astype(np.float32), cfg)
        amari_dev = amari_distance(
            np.asarray(res_dev.full_unmixing()), np.linalg.pinv(w_full_oracle)
        )
        records.append({
            "group": "oracle_conformance", "case": label, "n": n, "t": t,
            "density": dens,
            "amari_vs_oracle": amari,
            "amari_vs_oracle_device_whiten": amari_dev,
            "target": 1e-3,
            "pass": bool(amari < 1e-3),
            "iters": res.n_iterations, "oracle_iters": res_o["n_iterations"],
            "converged": res.converged, "oracle_converged": res_o["converged"],
            "fit_wall_s": fit_s, "oracle_wall_s": oracle_s,
        })
        print(f"oracle_conformance {label}: amari={amari:.2e} "
              f"({'PASS' if amari < 1e-3 else 'FAIL'}; "
              f"tpu {res.n_iterations} it / oracle {res_o['n_iterations']} it; "
              f"device-whiten pipeline {amari_dev:.2e})",
              file=sys.stderr)


# Cold-start phase budgets in seconds (docs/DESIGN.md "Cold-start
# budget"): generous 2x headroom over the measured cold timings so the
# check catches a compiled-surface regression (the round-2 failure
# mode: bench.py silently outgrew the driver's 590 s) without flaking
# on tunnel variance. Keyed by the phase tags bench.py logs (round-5
# structure: chip-acquire → seed measurement → full datagen/whiten/
# core — bench.py's failure-mode design points 2-4).
_COLD_BUDGET_S = {
    "acquire": 120.0,    # import + 1-element device op; sporadic
                         # chip-acquisition stalls of 60-600 s land
                         # HERE by design (attributable; the deadline
                         # thread still leaves a record if one eats
                         # the whole budget)
    "seed": 180.0,       # the full small-shape (64x1M) pipeline:
                         # datagen + whiten + core compile + 1 rep
    "datagen": 60.0,     # full-size on-device gen (warm rbg program)
    "whiten": 60.0,      # stats + projection executables (cached ~6 s)
    "core": 120.0,       # staged-precision loop (cached ~11 s) + reps
    "total": 420.0,      # hard driver limit is 590; self-budget 520
}


def _parse_cold_phases(stderr: str) -> dict:
    """Phase end-times from bench.py's stderr forensics lines.

    Returns {phase: seconds | None} for acquire/seed/datagen/whiten/
    core. Each phase is stamped by its own "... done" (or "seed
    measurement:") line; for "core", the Mosaic-fallback path logs
    "core compile/run failed" BEFORE the retry's "core compile+warm
    run done" — both start with the token "core", and stamping the
    first would let a budget-busting failed-attempt+retry escape the
    guard. Match done-lines only, keeping the LAST occurrence so a
    retry's cost is counted. The seed run's own datagen/whiten/core
    lines carry a "seed-" prefix and cannot match the full-run
    patterns (which anchor right after the "[bench +Xs] " stamp)."""
    import re

    def _last(pattern: str):
        end = None
        for m in re.finditer(r"\[bench \+\s*([0-9.]+)s\] " + pattern, stderr):
            end = float(m.group(1))
        return end

    return {
        "acquire": _last(r"chip-acquire: done"),
        "seed": _last(r"seed measurement:"),
        "datagen": _last(r"datagen: done"),
        "whiten": _last(r"center\+whiten done"),
        "core": _last(r"core compile\+warm run done"),
    }


def cold_check() -> int:
    """Clone the repo's committed HEAD to a temp dir and run
    ``bench.py`` there, asserting the cold-start budget.

    "Cold" means what the driver means — a FRESH CLONE: no gitignored
    caches, no uncommitted files, only what `git clone` delivers
    (round-3 lesson: a fresh *subprocess* in the builder's warm
    working tree validated the wrong "cold" and missed a 397 s
    datagen hole, VERDICT r3). Run after any change that grows the
    bench's compiled surface — and COMMIT first: uncommitted changes
    are invisible to this check by design."""
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix="picard_cold_") as td:
        clone = os.path.join(td, "repo")
        subprocess.run(
            ["git", "clone", "--quiet", "--depth", "1", f"file://{repo}", clone],
            check=True,
        )
        dirty = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain"],
            capture_output=True, text=True,
        ).stdout.strip()
        if dirty:
            print("cold-check: NOTE — working tree has uncommitted changes; "
                  "the clone tests committed HEAD only:\n" + dirty,
                  file=sys.stderr)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.join(clone, "bench.py")],
            capture_output=True, text=True, timeout=590, cwd=clone,
        )
        total = time.perf_counter() - t0
    sys.stderr.write(proc.stderr)

    failures = []
    if proc.returncode != 0:
        failures.append(f"bench.py exited {proc.returncode}")
    try:
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"cold-check: bench JSON ok ({rec['value']:.3e} {rec['unit']})",
              file=sys.stderr)
        if "degraded" in rec:
            # The driver would still get a record, but a healthy cold
            # run must measure its own number — a floor emission here
            # means the pipeline regressed.
            failures.append(f"record is degraded: {rec['degraded']}")
    except Exception as e:
        failures.append(f"no parseable JSON line on stdout ({e})")

    phase_ends = _parse_cold_phases(proc.stderr)
    prev = 0.0
    for phase in ("acquire", "seed", "datagen", "whiten", "core"):
        end = phase_ends.get(phase)
        if end is None:
            failures.append(f"phase '{phase}' left no forensics line")
            continue
        dur = end - prev
        prev = end
        budget = _COLD_BUDGET_S[phase]
        status = "ok" if dur <= budget else "OVER BUDGET"
        if phase == "acquire" and dur > budget:
            # The acquire phase measures the ENVIRONMENT, not the code:
            # chip-acquisition stalls on this tunnel spread 0.2 s to
            # >570 s between adjacent runs (bench_r5_records.md). An
            # over-budget acquire is reported but does not fail the
            # check — the code-regression signal lives in the other
            # phases and in the non-degraded in-run record (the
            # degraded-record failure above still catches a stall that
            # consumed the whole budget).
            status = "over budget (environmental; not a failure)"
        print(f"cold-check: {phase} {dur:.1f}s (budget {budget:.0f}s) {status}",
              file=sys.stderr)
        if dur > budget and phase != "acquire":
            failures.append(f"{phase} {dur:.1f}s > {budget:.0f}s")
    print(f"cold-check: total {total:.1f}s (budget {_COLD_BUDGET_S['total']:.0f}s)",
          file=sys.stderr)
    if total > _COLD_BUDGET_S["total"] and not (
            phase_ends.get("acquire", 0.0) > _COLD_BUDGET_S["acquire"]):
        failures.append(f"total {total:.1f}s > {_COLD_BUDGET_S['total']:.0f}s")

    if failures:
        print("cold-check FAILED: " + "; ".join(failures), file=sys.stderr)
        return 1
    print("cold-check PASSED", file=sys.stderr)
    return 0


GROUPS = {
    "criterion": lambda r, a: group_criterion_grid(r, a.reps, a.quick),
    "n_components": lambda r, a: group_n_components(r, a.reps),
    "ortho": lambda r, a: group_ortho(r, a.reps),
    "extended": lambda r, a: group_extended(r, a.reps),
    "baseline": lambda r, a: group_baseline_configs(r, a.reps, a.quick),
    "large_n": lambda r, a: group_large_n(r, a.reps, a.quick),
    "conformance": lambda r, a: group_oracle_conformance(r),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller grid")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--json", default=None, help="write records to this file")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--group", action="append", choices=sorted(GROUPS),
                    help="run only these groups (default: all)")
    ap.add_argument("--cold-check", action="store_true",
                    help="run bench.py in a fresh process and assert the "
                         "cold-start budget (docs/DESIGN.md), then exit")
    args = ap.parse_args()

    if args.cold_check:
        sys.exit(cold_check())

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    try:
        # The suite compiles many shapes; persist them across processes
        # (separate from bench.py's curated committed .jax_cache).
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_suite")
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    records = []
    failures = []
    t0 = time.perf_counter()
    selected = args.group or ["criterion", "n_components", "ortho",
                              "extended", "baseline", "conformance"]
    for name in selected:
        try:
            GROUPS[name](records, args)
        except Exception as e:
            # A crashed group (device OOM, tunnel kill) must not void
            # the rows already measured — chip time is the scarce
            # resource here. Record the failure and keep going.
            import traceback

            traceback.print_exc()
            failures.append({"group": name, "error": f"{type(e).__name__}: {e}"})
            print(f"group '{name}' FAILED ({e}); keeping "
                  f"{len(records)} records collected so far", file=sys.stderr)
    total = time.perf_counter() - t0

    out = {
        "backend": jax.default_backend(),
        "total_wall_s": total,
        "records": records,
    }
    if failures:
        out["group_failures"] = failures
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2, default=float)
        print(f"wrote {args.json}", file=sys.stderr)
    else:
        json.dump(out, sys.stdout, indent=2, default=float)
        print()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
