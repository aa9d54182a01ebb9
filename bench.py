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

Failure-mode design (rounds 2-4 each produced a null driver record;
this file's FIRST job is to leave a parseable record under EVERY
observed failure mode — the reference harness is cold-runnable and
unattended, benches/benchmarks.rs:130-141, so this must be too):

  1. A JSON line is ALWAYS emitted — on clean exit, on SIGTERM, on the
     570 s self-deadline, and on any exception. If no in-run
     measurement exists (round 4: the first device op blocked for the
     whole budget on a chip-acquisition stall), the committed floor
     record ``benchmarks/bench_floor.json`` — the most conservative
     driver-verified measurement of this same bench on this same chip
     — is emitted with a "degraded" marker, so the driver parses a
     real (understated) number instead of nothing.
  2. The chip is acquired FIRST with a trivial 1-element op behind its
     own forensics line, so a 250-600 s acquisition stall (observed
     round 4) is attributable and bounded before any data-scale work.
  3. A SEED measurement at a small cached shape (N=64, T=1M) runs
     before the full config and seeds the best-so-far record within
     ~2 minutes of start — understated (per-launch overhead looms
     larger at T=1M) but valid.
  4. Budget-aware shrink: the full-config T is chosen from the budget
     remaining after the seed run (4M / 2M / 1M / skip).
  5. A heartbeat thread logs every ~15 s during any silent phase
     (PJRT blocking calls release the GIL), so a stalled run leaves
     continuous forensics instead of a 9-minute gap.
  6. NOTHING on the critical path runs on the host CPU at data scale
     (round 3 died in 397 s of single-core host LCG datagen; the
     device generates the mixture via the hardware rbg PRNG).
  7. A persistent XLA compilation cache at ``.jax_cache/`` is
     committed warm for the bench-shape executables; the axon
     remote-compile helper additionally keeps its own server-side
     cache (docs/BENCHMARKS.md records which phases depend on which).

Config: Picard-O + extended + tanh at N=64, T=4M (BASELINE.json
configs 2/3 scale).

Test-only env hooks (used by tests/test_bench_cli.py to drive the
failure paths in a subprocess; all default off):
  PICARD_BENCH_TEST_STALL_S  sleep this long before the first device
                             op (stall injection)
  PICARD_BENCH_DEADLINE_S    override the 570 s self-deadline
  PICARD_BENCH_BUDGET_S      override the 520 s measurement budget
  PICARD_BENCH_PLATFORM      jax platform override (e.g. "cpu"); also
                             disables the repo compile cache so CPU
                             executables never pollute the committed
                             TPU cache
  PICARD_BENCH_N/T/SEED_T/REPS   shrink the config to toy scale
  PICARD_BENCH_SEED          datagen stream seed (default 42) — used
                             by the committed headline-spread record
                             (benchmarks/bench_r5_records.md) to show
                             the number is not stream-trajectory luck
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time
import traceback

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))

N_COMPONENTS = int(os.environ.get("PICARD_BENCH_N", "64"))
# 4M samples: enough to amortize this environment's fixed per-launch
# dispatch overhead (~35 ms through the TPU tunnel) so the number
# reflects steady-state device throughput; converges to tol=1e-7 in
# ~30 iterations (verified up to T=10M: 46 iters, gnorm 2.6e-8).
N_SAMPLES = int(os.environ.get("PICARD_BENCH_T", "4000000"))
# The early seed measurement's sample count (point 3 above).
SEED_SAMPLES = int(os.environ.get("PICARD_BENCH_SEED_T", "1000000"))
TOL = 1e-7  # the reference tolerance: achievable in f32 thanks to the
# delta-based line search + per-tile partials with tree reduction
MAX_ITER = 100
REPS = int(os.environ.get("PICARD_BENCH_REPS", "3"))

_T0 = time.time()
# Self-imposed budget: the driver runs `timeout 590 python bench.py`;
# stop measuring (and print what we have) well before it kills us.
_BUDGET_S = float(os.environ.get("PICARD_BENCH_BUDGET_S", "520"))
_DEADLINE_S = float(os.environ.get("PICARD_BENCH_DEADLINE_S", "570"))
_BEST: dict = {}
_FLOOR_PATH = os.path.join(_REPO, "benchmarks", "bench_floor.json")
# Recorded NumPy-f64 baseline on this box (round 2), used when the
# budget has no room left to re-measure it.
_RECORDED_CPU_SPS = 2.4e6

# [timestamp of last log line, text of last non-heartbeat line] — the
# heartbeat thread reads this to attribute silent phases.
_LAST_LOG = [time.time(), "startup"]


def _log(msg: str) -> None:
    _LAST_LOG[0] = time.time()
    if not msg.startswith("heartbeat"):
        _LAST_LOG[1] = msg.split("\n", 1)[0][:120]
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_EMITTED = False
_EMIT_LOCK = threading.Lock()


def _load_floor() -> dict:
    """The committed floor record: the most conservative
    driver-verified chip measurement of this bench (BENCH_r01.json).
    Emitted only when a run produced no measurement of its own."""
    try:
        with open(_FLOOR_PATH) as f:
            return json.load(f)
    except Exception:  # pragma: no cover - file is committed
        return {"sps": 2.47e8, "cpu_sps": _RECORDED_CPU_SPS,
                "provenance": "builtin fallback (floor file unreadable)"}


def _emit() -> None:
    """Print the result JSON — at most once per process. Called
    normally at the end, and from the SIGTERM handler / deadline
    thread / exception path, so EVERY run leaves a parseable record.
    Uses the best in-run measurement when one exists, else the
    committed floor record with a "degraded" marker. The lock + flag
    keep the 'exactly one JSON line on stdout' contract when the
    deadline thread fires concurrently with a normal exit."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        if _BEST:
            rec = {
                "metric": "grad_loop_samples_per_sec_per_chip",
                "value": _BEST["sps"],
                "unit": "samples/s/chip",
                "vs_baseline": _BEST["sps"] / _BEST.get("cpu_sps", _RECORDED_CPU_SPS),
            }
        else:
            floor = _load_floor()
            _log("no in-run measurement; emitting the committed floor record "
                 f"({floor.get('provenance', 'unknown provenance')})")
            rec = {
                "metric": "grad_loop_samples_per_sec_per_chip",
                "value": floor["sps"],
                "unit": "samples/s/chip",
                "vs_baseline": floor["sps"] / floor.get("cpu_sps", _RECORDED_CPU_SPS),
                "degraded": "no in-run measurement completed; value is the "
                            "committed floor (benchmarks/bench_floor.json)",
            }
        print(json.dumps(rec), flush=True)


def _emit_and_exit(reason: str):  # pragma: no cover - timeout paths
    """Shared exit path for SIGTERM and the self-deadline thread.
    Always exits 0: a record was emitted (floor if nothing better)."""
    _log(f"{reason}; emitting best-so-far result")
    _emit()
    os._exit(0)


signal.signal(
    signal.SIGTERM, lambda signum, frame: _emit_and_exit(f"signal {signum}")
)

# The SIGTERM handler above only runs while the main thread executes
# Python bytecode. If the driver's `timeout 590` fires while we are
# stuck inside an uninterruptible PJRT call (chip acquisition after an
# outage, a cold remote compile), the handler never gets a chance —
# and a process that swallows SIGTERM would make plain `timeout` wait
# forever. A daemon TIMER thread is immune to that failure mode (PJRT
# blocking calls release the GIL): at the deadline it emits the
# best-so-far record (floor if none) and hard-exits, so the driver
# always gets rc=0 + a JSON line before its own 590 s deadline.


def _start_deadline_timer() -> "threading.Timer":
    timer = threading.Timer(
        _DEADLINE_S, _emit_and_exit,
        args=(f"{_DEADLINE_S:.0f}s self-deadline reached",),
    )
    timer.daemon = True
    timer.start()
    return timer


def _start_heartbeat() -> threading.Event:
    """Log every ~15 s while no other line has printed — PJRT blocking
    calls release the GIL, so this runs even when the main thread is
    stuck inside a chip-acquisition stall or a remote compile (the
    round-4 record had a 570 s forensics gap; this closes it).
    Returns a stop event owned by this run (module flags get re-armed
    between in-process test runs; a shared flag would leak threads)."""
    stop = threading.Event()

    def beat():
        while not stop.wait(5.0):
            quiet = time.time() - _LAST_LOG[0]
            if quiet >= 15.0:
                _log(f"heartbeat: still in '{_LAST_LOG[1]}' "
                     f"({quiet:.0f}s since last line)")
    threading.Thread(target=beat, daemon=True).start()
    return stop


def _jax():
    """Import jax, applying the test-only platform override before any
    backend init (the env pins JAX_PLATFORMS=axon at a level that
    beats shell exports — jax.config.update is the only lever)."""
    import jax

    plat = os.environ.get("PICARD_BENCH_PLATFORM")
    if plat and not getattr(_jax, "_platform_set", False):
        jax.config.update("jax_platforms", plat)
        _jax._platform_set = True
    return jax


def _enable_compilation_cache() -> None:
    """Point JAX at the repo's committed compilation cache.

    The axon remote-compile helper honors the standard persistent
    cache (measured: fresh-process compile of a cached executable
    drops from minutes to <1 s). Failures are non-fatal — the bench
    still runs, just slower. Skipped under a platform override so CPU
    executables never pollute the committed TPU cache."""
    if os.environ.get("PICARD_BENCH_PLATFORM"):
        _log("platform override set; leaving the repo compile cache untouched")
        return
    jax = _jax()

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # pragma: no cover - config names are stable
        _log(f"compilation cache unavailable: {e}")


def _chip_acquire() -> None:
    """Acquire the device with a trivial op behind its own forensics
    line, so the sporadic 250-600 s first-execute stall (observed
    round 4, environmental) is attributable and spent on a 1-element
    add instead of the data-scale pipeline."""
    stall = float(os.environ.get("PICARD_BENCH_TEST_STALL_S", "0") or 0.0)
    if stall:  # test-only stall injection (docstring at top)
        _log(f"chip-acquire: injected test stall of {stall:.0f}s")
        time.sleep(stall)
    jax = _jax()
    import jax.numpy as jnp

    t0 = time.time()
    _log(f"chip-acquire: devices {jax.devices()}")
    np.asarray(jnp.zeros((1,), jnp.float32) + 1.0)  # real sync
    _log(f"chip-acquire: done in {time.time() - t0:.1f}s")


def _choose_full_t(remaining_s: float) -> int | None:
    """Budget-aware shrink (failure-mode design point 4): pick the
    full-config T from the measurement budget left after the seed run.
    The full 4M pipeline costs ~60 s cold through the tunnel; each
    step down halves the data-scale work. None = keep the seed
    measurement."""
    if remaining_s >= 240:
        return N_SAMPLES
    if remaining_s >= 120:
        return min(N_SAMPLES, 2_000_000)
    if remaining_s >= 60:
        return min(N_SAMPLES, 1_000_000)
    return None


def _measure_config(n: int, t: int, reps: int, tag: str = "") -> tuple:
    """datagen → whiten → core compile+warm → timed reps at (n, t).

    Seeds/updates the module-level best-so-far record ``_BEST`` as
    soon as any valid number exists: first with the warm run's
    compile-inclusive lower bound, then with each clean rep (keeping
    the max). ``tag`` prefixes the forensics lines ("seed-" for the
    seed run) so suite.py --cold-check can budget the phases apart."""
    jax = _jax()
    import jax.numpy as jnp

    from picard_ica_tpu.models.core import CoreOptions, run_core_jit
    from picard_ica_tpu.ops.densities import Tanh
    from picard_ica_tpu.ops.whitening import center_whiten
    from picard_ica_tpu.utils.datagen import generate_bench_data_device

    seed = int(os.environ.get("PICARD_BENCH_SEED", "42"))
    t0 = time.time()
    _log(f"{tag}datagen: generating {n}x{t} Laplace mixture on device "
         f"(seed {seed})")
    x = generate_bench_data_device(n, t, seed=seed)
    np.asarray(x[:1, :1])  # real sync (block_until_ready lies here)
    _log(f"{tag}datagen: done in {time.time() - t0:.1f}s")
    t0 = time.time()
    xw, _, _ = center_whiten(x, n)
    np.asarray(xw[:1, :1])
    _log(f"{tag}center+whiten done in {time.time() - t0:.1f}s")
    del x

    opts = CoreOptions(
        density=Tanh(), ortho=True, extended=True, has_cov=True, m=7, ls_tries=10,
        use_pallas=True, kernel_precision="auto",
    )
    cov = jnp.eye(n, dtype=jnp.float32)

    def run():
        return run_core_jit(xw, cov, TOL, 0.01, MAX_ITER, opts)

    t0 = time.time()
    try:
        result = run()
        jax.block_until_ready(result)  # compile + warm
    except Exception as e:
        # Escape hatch for a Mosaic rejection of the tanh-native f32
        # delta form (ops/densities._TANH_NATIVE_DELTA): fall back to
        # the round-2-validated exp-based form and retrace — a
        # slightly slower bench beats a crashed one.
        from picard_ica_tpu.ops import densities

        if not densities._TANH_NATIVE_DELTA:
            raise
        _log(f"{tag}core compile/run failed ({type(e).__name__}: {str(e)[:300]})")
        _log("retrying once with _TANH_NATIVE_DELTA=False (exp-form delta)")
        densities._TANH_NATIVE_DELTA = False
        jax.clear_caches()
        # Deliberately NOT resetting t0: the degraded lower bound below
        # must cover the failed attempt's compile time too, or a
        # driver-timed-out run would overstate its throughput.
        result = run()
        jax.block_until_ready(result)
    warm_s = time.time() - t0
    _log(f"{tag}core compile+warm run done in {warm_s:.1f}s "
         f"({int(result.n_iterations)} iters, "
         f"stage_exits={[int(v) for v in result.stage_exits]}, "
         f"stage_ls_calls={[int(v) for v in result.stage_ls_calls]})")
    # Degraded lower bound in case a timeout lands before any clean
    # rep: the warm run's wall time still includes compile.
    warm_sps = t * int(result.n_iterations) / warm_s
    if warm_sps > _BEST.get("sps", 0.0):
        _BEST.update(sps=warm_sps, iters=int(result.n_iterations))
    if not bool(result.converged):
        print(
            f"warning: did not reach tol={TOL} "
            f"(gnorm={float(result.gradient_norm):.2e})",
            file=sys.stderr,
        )

    best_sps, best_iters = 0.0, 0
    for rep in range(reps):
        if time.time() - _T0 > _BUDGET_S:
            _log(f"budget {_BUDGET_S:.0f}s reached after {rep} reps; stopping")
            break
        t0 = time.perf_counter()
        result = run()
        jax.block_until_ready(result)
        elapsed = time.perf_counter() - t0
        iters = int(result.n_iterations)
        sps = t * iters / elapsed
        _log(f"{tag}rep {rep}: {sps:.3e} samples/s ({iters} iters, {elapsed:.2f}s)")
        if sps > best_sps:
            best_sps, best_iters = sps, iters
        if sps > _BEST.get("sps", 0.0):
            _BEST.update(sps=sps, iters=iters)
    if best_sps == 0.0:
        return _BEST["sps"], _BEST["iters"]
    return best_sps, best_iters


# Error shapes this environment's chip produces when it dies mid-
# process (watchdog kills after heavy compile sessions, tunnel drops)
# — the ONLY failures worth a 30 s re-acquire + retry; anything else
# is a deterministic bug and should surface immediately (it still
# leaves a record via main()'s catch-all).
_CRASH_TOKENS = (
    "failed_precondition", "tpu backend", "worker crashed", "unavailable",
    "kernel fault", "socket closed", "deadline_exceeded", "internal:",
)


def _is_crash_shaped(e: Exception) -> bool:
    msg = f"{type(e).__name__}: {e}".lower()
    return any(tok in msg for tok in _CRASH_TOKENS)


def _measure_with_retry(n: int, t: int, reps: int, tag: str = "") -> tuple:
    """One retry after a crash-shaped TPU failure.

    This environment's chip sporadically dies mid-process; the next
    client re-acquires it in ~30-60 s. The driver runs bench.py
    exactly once, so a transient crash must not void the round's
    record: drop the poisoned PJRT client, let the backend rebuild,
    and re-measure. Deterministic (non-crash-shaped) errors re-raise
    immediately — no 30 s sleep taxing a plain bug."""
    try:
        return _measure_config(n, t, reps, tag)
    except Exception as e:  # pragma: no cover - needs a real chip crash
        if not _is_crash_shaped(e):
            raise
        _log(f"TPU attempt failed ({type(e).__name__}: {str(e)[:200]})")
        if time.time() - _T0 > _BUDGET_S - 120:
            raise  # no time for a re-acquire + full retry
        _log("rebuilding the TPU backend and retrying once")
        jax = _jax()

        try:  # private API — feature-tested so version drift degrades
            from jax._src import xla_bridge

            clear = getattr(xla_bridge, "_clear_backends", None)
            if clear is not None:
                clear()
            else:
                _log("xla_bridge._clear_backends absent; plain retry")
        except Exception as clear_err:
            _log(f"backend clear failed ({clear_err}); retrying anyway")
        jax.clear_caches()
        time.sleep(30.0)
        return _measure_config(n, t, reps, tag)


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


def main():
    global _EMITTED
    _EMITTED = False  # re-arm: one JSON line per measurement run
    deadline = _start_deadline_timer()
    heartbeat_stop = _start_heartbeat()
    _log("enabling persistent compilation cache")
    _enable_compilation_cache()
    try:
        _chip_acquire()
        # Seed measurement: a small cached shape seeds _BEST with an
        # understated-but-valid record within ~2 minutes of start,
        # BEFORE the full-size pipeline (failure-mode design point 3).
        seed_t = min(SEED_SAMPLES, N_SAMPLES)
        sps, iters = _measure_with_retry(N_COMPONENTS, seed_t, reps=1, tag="seed-")
        _log(f"seed measurement: {sps:.3e} samples/s ({iters} iters at T={seed_t})")
        remaining = _BUDGET_S - (time.time() - _T0)
        full_t = _choose_full_t(remaining)
        if full_t is None:
            _log(f"{remaining:.0f}s of budget left; keeping the seed measurement")
        else:
            if full_t < N_SAMPLES:
                _log(f"{remaining:.0f}s of budget left; shrinking full config "
                     f"to T={full_t}")
            _measure_with_retry(N_COMPONENTS, full_t, reps=REPS, tag="")
    except Exception:
        _log("measurement failed:\n" + traceback.format_exc())

    if _BEST and time.time() - _T0 < _BUDGET_S:
        _log("running NumPy f64 CPU baseline")
        _BEST["cpu_sps"] = _cpu_numpy_samples_per_sec()
    elif _BEST:
        # Out of budget: fall back to the committed round-2 measurement
        # of the same baseline on this box (~2.4e6 samples/s).
        _BEST["cpu_sps"] = _RECORDED_CPU_SPS
        _log(f"budget reached; using recorded CPU baseline {_RECORDED_CPU_SPS:.1e}")
    if _BEST:
        _log(
            f"tpu: {_BEST['sps']:.3e} samples/s/chip "
            f"({_BEST['iters']} iters to tol={TOL}) | "
            f"numpy-f64 cpu: {_BEST['cpu_sps']:.3e} samples/s"
        )
    deadline.cancel()
    heartbeat_stop.set()
    _emit()


if __name__ == "__main__":
    main()
