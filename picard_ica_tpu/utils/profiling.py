"""Profiling helpers (SURVEY.md §5: the reference's only performance
tooling is criterion wall-clock benches; the TPU-native equivalents are
``jax.profiler`` device traces plus throughput summaries).

``profile_fit`` wraps a fit in a profiler trace viewable in
TensorBoard/XProf or parseable from the emitted ``*.trace.json.gz``.
``fit_with_timing`` reports the numbers BASELINE.md tracks: wall time,
iterations to tolerance, and grad-loop samples/s/chip.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from ..config import PicardConfig
from ..solver import Picard


def profile_fit(x, config: Optional[PicardConfig] = None, mesh=None,
                trace_dir: str = "/tmp/picard_trace"):
    """Run ``Picard.fit`` under a jax.profiler trace; returns the result.

    The caller should have warmed the compile cache (run the same shapes
    once before) so the trace shows steady-state device time rather
    than compilation.
    """
    with jax.profiler.trace(trace_dir):
        result = Picard.fit(x, config, mesh=mesh)
        jax.block_until_ready(result.sources)
    return result


def fit_with_timing(x, config: Optional[PicardConfig] = None, mesh=None,
                    reps: int = 3) -> dict:
    """Fit ``reps`` times (after one warm-up) and report throughput.

    Returns a dict with the fitted result plus ``wall_s`` (best of
    reps), ``iterations``, ``samples_per_s`` (T * iterations / wall —
    the grad-loop rate BASELINE.md's headline metric uses, attributing
    the whole wall time to the optimizer loop, i.e. a lower bound) and
    ``samples_per_s_per_chip``.
    """
    result = Picard.fit(x, config, mesh=mesh)
    jax.block_until_ready(result.sources)

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = Picard.fit(x, config, mesh=mesh)
        jax.block_until_ready(result.sources)
        best = min(best, time.perf_counter() - t0)

    t = x.shape[1]
    n_chips = mesh.devices.size if mesh is not None else 1
    sps = t * max(result.n_iterations, 1) / best
    return {
        "result": result,
        "wall_s": best,
        "iterations": result.n_iterations,
        "converged": result.converged,
        "samples_per_s": sps,
        "samples_per_s_per_chip": sps / n_chips,
        "n_chips": n_chips,
    }
