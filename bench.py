"""Benchmark: grad-loop throughput of the Picard core loop on TPU.

Prints exactly one JSON line on stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Methodology: generate the benchmark mixture ON DEVICE (the reference
harness's distributions, benches/benchmarks.rs:8-35: Laplace sources
and the bit-exact reference LCG mixing block — see
utils.datagen.generate_bench_data_device), whiten on device, then time
the jitted core optimizer to convergence and report
``T * n_iterations / wall_time`` — grad-loop samples/s/chip, the
BASELINE.json headline metric. Each iteration includes the moment
pass, L-BFGS direction, and matrix-exponential line search
(reference hot loop: core.rs:211-391).

The reference publishes no absolute numbers (BASELINE.md), so
``vs_baseline`` is the speedup over a NumPy f64 CPU execution of the
same per-iteration data-axis work measured in the same run — a
stand-in for the reference's BLAS-backed CPU hot loop.

Cold-start design (the reference harness is cold-runnable,
benches/benchmarks.rs:130-141; this must be too — from a FRESH CLONE):
  * NOTHING on the critical path runs on the host CPU at data scale.
    Round 3's record died in 397 s of single-core host LCG datagen;
    the device generates the same 64x4M mixture in milliseconds.
  * A persistent XLA compilation cache lives at ``.jax_cache/`` in the
    repo and is COMMITTED warm for every bench-shape executable — the
    axon remote compiler honors it (measured: a cached executable
    loads in <1 s vs minutes of remote compile), so a fresh clone pays
    no remote compiles.
  * Every phase prints a timed progress line to stderr so a timed-out
    run leaves forensics (the `datagen:`/`whiten`/`core` tokens are
    parsed by benchmarks/suite.py --cold-check).
  * A 520 s self-budget stops measurement early, and a SIGTERM handler
    emits the best-so-far JSON — a driver-timed-out run still leaves a
    parsable (if understated) record instead of nothing.

Config: Picard-O + extended + tanh at N=64, T=4M (BASELINE.json
configs 2/3 scale).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))

N_COMPONENTS = 64
# 4M samples: enough to amortize this environment's fixed per-launch
# dispatch overhead (~35 ms through the TPU tunnel) so the number
# reflects steady-state device throughput; converges to tol=1e-7 in
# ~36 iterations (verified up to T=10M: 46 iters, gnorm 2.6e-8).
N_SAMPLES = 4_000_000
TOL = 1e-7  # the reference tolerance: achievable in f32 thanks to the
# delta-based line search + per-tile partials with tree reduction
MAX_ITER = 100
REPS = 3

_T0 = time.time()
# Self-imposed budget: the driver runs `timeout 590 python bench.py`;
# stop measuring (and print what we have) well before it kills us.
_BUDGET_S = 520.0
_BEST: dict = {}


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_EMITTED = False
_EMIT_LOCK = __import__("threading").Lock()


def _emit() -> None:
    """Print the result JSON from the best measurement so far — at most
    once per process. Called normally at the end, and from the SIGTERM
    handler / deadline thread so even a run the driver times out leaves
    a parsable record. The lock + flag keep the 'exactly one JSON line
    on stdout' contract when the deadline thread fires concurrently
    with a normal exit."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED or not _BEST:
            return
        _EMITTED = True
        print(json.dumps({
            "metric": "grad_loop_samples_per_sec_per_chip",
            "value": _BEST["sps"],
            "unit": "samples/s/chip",
            "vs_baseline": _BEST["sps"] / _BEST.get("cpu_sps", 2.4e6),
        }), flush=True)


def _emit_and_exit(reason: str):  # pragma: no cover - timeout paths
    """Shared exit path for SIGTERM and the self-deadline thread."""
    _log(f"{reason}; emitting best-so-far result")
    _emit()
    os._exit(0 if _BEST else 1)


signal.signal(
    signal.SIGTERM, lambda signum, frame: _emit_and_exit(f"signal {signum}")
)

# The SIGTERM handler above only runs while the main thread executes
# Python bytecode. If the driver's `timeout 590` fires while we are
# stuck inside an uninterruptible PJRT call (chip acquisition after an
# outage, a cold remote compile), the handler never gets a chance —
# and a process that swallows SIGTERM would make plain `timeout` wait
# forever. A daemon TIMER thread is immune to that failure mode (PJRT
# blocking calls release the GIL): at T+570 s it emits the best-so-far
# record and hard-exits, so the driver always gets its exit + whatever
# JSON exists, before its own 590 s deadline.
import threading


def _start_deadline_timer() -> "threading.Timer":
    timer = threading.Timer(
        570.0, _emit_and_exit, args=("570s self-deadline reached",)
    )
    timer.daemon = True
    timer.start()
    return timer


def _enable_compilation_cache() -> None:
    """Point JAX at the repo's committed compilation cache.

    The axon remote-compile helper honors the standard persistent
    cache (measured: fresh-process compile of a cached executable
    drops from minutes to <1 s). Failures are non-fatal — the bench
    still runs, just slower."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # pragma: no cover - config names are stable
        _log(f"compilation cache unavailable: {e}")


def _tpu_samples_per_sec() -> tuple:
    import jax
    import jax.numpy as jnp

    from picard_ica_tpu.models.core import CoreOptions, run_core_jit
    from picard_ica_tpu.ops.densities import Tanh
    from picard_ica_tpu.ops.whitening import center_whiten
    from picard_ica_tpu.utils.datagen import generate_bench_data_device

    _log(f"devices: {jax.devices()}")
    t0 = time.time()
    _log(f"datagen: generating {N_COMPONENTS}x{N_SAMPLES} Laplace mixture on device")
    x = generate_bench_data_device(N_COMPONENTS, N_SAMPLES, seed=42)
    np.asarray(x[:1, :1])  # real sync (block_until_ready lies here)
    _log(f"datagen: done in {time.time() - t0:.1f}s")
    t0 = time.time()
    xw, _, _ = center_whiten(x, N_COMPONENTS)
    np.asarray(xw[:1, :1])
    _log(f"center+whiten done in {time.time() - t0:.1f}s")
    del x

    opts = CoreOptions(
        density=Tanh(), ortho=True, extended=True, has_cov=True, m=7, ls_tries=10,
        use_pallas=True, kernel_precision="auto",
    )
    cov = jnp.eye(N_COMPONENTS, dtype=jnp.float32)

    def run():
        return run_core_jit(xw, cov, TOL, 0.01, MAX_ITER, opts)

    t0 = time.time()
    try:
        result = run()
        jax.block_until_ready(result)  # compile + warm
    except Exception as e:
        # Escape hatch for the one Mosaic surface no committed TPU run
        # has validated yet: the tanh-native f32 delta form
        # (ops/densities._TANH_NATIVE_DELTA). If its lowering is
        # rejected, fall back to the round-2-validated exp-based form
        # and retrace — a slightly slower bench beats a crashed one.
        from picard_ica_tpu.ops import densities

        if not densities._TANH_NATIVE_DELTA:
            raise
        _log(f"core compile/run failed ({type(e).__name__}: {str(e)[:300]})")
        _log("retrying once with _TANH_NATIVE_DELTA=False (exp-form delta)")
        densities._TANH_NATIVE_DELTA = False
        jax.clear_caches()
        # Deliberately NOT resetting t0: the degraded lower bound below
        # must cover the failed attempt's compile time too, or a
        # driver-timed-out run would overstate its throughput.
        result = run()
        jax.block_until_ready(result)
    warm_s = time.time() - t0
    _log(f"core compile+warm run done in {warm_s:.1f}s "
         f"({int(result.n_iterations)} iters, "
         f"stage_exits={[int(v) for v in result.stage_exits]}, "
         f"stage_ls_calls={[int(v) for v in result.stage_ls_calls]})")
    # Degraded lower bound in case the driver's timeout lands before
    # any clean rep: the warm run's wall time still includes compile.
    _BEST.setdefault("sps", N_SAMPLES * int(result.n_iterations) / warm_s)
    _BEST.setdefault("iters", int(result.n_iterations))
    if not bool(result.converged):
        print(
            f"warning: did not reach tol={TOL} "
            f"(gnorm={float(result.gradient_norm):.2e})",
            file=sys.stderr,
        )

    best_sps, best_iters = 0.0, 0
    for rep in range(REPS):
        if time.time() - _T0 > _BUDGET_S:
            _log(f"budget {_BUDGET_S:.0f}s reached after {rep} reps; stopping")
            break
        t0 = time.perf_counter()
        result = run()
        jax.block_until_ready(result)
        elapsed = time.perf_counter() - t0
        iters = int(result.n_iterations)
        sps = N_SAMPLES * iters / elapsed
        _log(f"rep {rep}: {sps:.3e} samples/s ({iters} iters, {elapsed:.2f}s)")
        if sps > best_sps:
            best_sps, best_iters = sps, iters
            _BEST.update(sps=best_sps, iters=best_iters)
    if best_sps == 0.0:
        return _BEST["sps"], _BEST["iters"]
    return best_sps, best_iters


def _cpu_numpy_samples_per_sec() -> float:
    """NumPy f64 mirror of one grad-loop iteration's data-axis work:
    score+derivative, gradient moment, E[psi'], plus one line-search
    try (rotate + log-lik) — the ops the reference executes per
    iteration on CPU BLAS (core.rs:215-227, 124-127)."""
    n, t = N_COMPONENTS, min(N_SAMPLES, 200_000)  # keep CPU timing sane
    rng = np.random.default_rng(0)
    y = rng.standard_normal((n, t))
    tm = np.eye(n) + 0.01 * rng.standard_normal((n, n))

    def one_iter(y):
        psi = np.tanh(y)
        psi_d = 1.0 - psi * psi
        g = psi @ y.T / t
        pm = psi_d.mean(axis=1)
        y_new = tm @ y
        abs_y = np.abs(y_new)
        ll = abs_y + np.log1p(np.exp(-2.0 * abs_y))
        return g, pm, ll.mean(axis=1)

    one_iter(y)  # warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        one_iter(y)
    elapsed = time.perf_counter() - t0
    return t * reps / elapsed


def _tpu_samples_per_sec_with_retry() -> tuple:
    """One retry after a TPU worker crash.

    This environment's chip sporadically dies mid-process
    ("FAILED_PRECONDITION: TPU backend error", watchdog kills after
    heavy compile sessions — observed round 4); the next client
    re-acquires it in ~30-60 s. The driver runs bench.py exactly once,
    so a transient crash must not void the round's record: drop the
    poisoned PJRT client, let the backend rebuild, and re-measure."""
    try:
        return _tpu_samples_per_sec()
    except Exception as e:  # pragma: no cover - needs a real chip crash
        _log(f"TPU attempt failed ({type(e).__name__}: {str(e)[:200]})")
        if time.time() - _T0 > _BUDGET_S - 120:
            raise  # no time for a re-acquire + full retry
        _log("rebuilding the TPU backend and retrying once")
        import jax

        try:
            from jax._src import xla_bridge

            xla_bridge._clear_backends()
        except Exception as clear_err:
            _log(f"backend clear failed ({clear_err}); retrying anyway")
        jax.clear_caches()
        time.sleep(30.0)
        return _tpu_samples_per_sec()


def main():
    global _EMITTED
    _EMITTED = False  # re-arm: one JSON line per measurement run
    deadline = _start_deadline_timer()
    _log("enabling persistent compilation cache")
    _enable_compilation_cache()
    tpu_sps, iters = _tpu_samples_per_sec_with_retry()
    if time.time() - _T0 < _BUDGET_S:
        _log("running NumPy f64 CPU baseline")
        cpu_sps = _cpu_numpy_samples_per_sec()
    else:
        # Out of budget: fall back to the committed round-2 measurement
        # of the same baseline on this box (~2.4e6 samples/s).
        cpu_sps = 2.4e6
        _log("budget reached; using recorded CPU baseline 2.4e6")
    _BEST.update(sps=tpu_sps, iters=iters, cpu_sps=cpu_sps)
    _log(
        f"tpu: {tpu_sps:.3e} samples/s/chip ({iters} iters to tol={TOL}) | "
        f"numpy-f64 cpu: {cpu_sps:.3e} samples/s"
    )
    deadline.cancel()
    _emit()


if __name__ == "__main__":
    main()
