"""Single-chip HBM peak model for a full bench/fit pipeline.

Round 4 chip-probed the 256xT max-T progression (docs/BENCHMARKS.md,
benchmarks/suite.py baseline_5 max-T row) but encoded the buffer
anatomy only in prose; this module turns it into arithmetic a test can
pin, so buffer-structure changes can't silently regress max-T
(VERDICT r4 item 7).

Phase anatomy (f32 data, all chip-verified in round 4's probes;
``nf`` = n_features of the raw data, ``n`` = n_components, usually
equal on the bench path):

  datagen     1 data buffer — sources are mixed IN PLACE via the
              blockwise aliased rotation (utils/datagen.py:_gen).
  stats       x + the chunked covariance partials (pairwise fold,
              ~n_chunks * nf^2 — KB-scale).
  projection  x (nf, T) + x1 (n, T): the whitened copy materializes
              while the raw data is still alive — THE binding phase
              at 2 full data buffers (ops/whitening._project_centered).
  refine      x1 rotated in place + one rotation block
              (ops/linalg.rotate_rows_inplace_blocks).
  core        x1 donated (aliased onto the final Y) + the staged
              schedule's bf16 X copy (half a buffer, models/core.py)
              + the grouped moment partials (ops/pallas_kernels).

Arena calibration: the v5e chip exposes a ~15.75 GB XLA arena, but the
usable ceiling for THIS pipeline is lower (program temporaries,
launch-time padding, allocator granularity). Round-4 chip
measurements bracket it: 256x6M (projection peak 12.29e9) fits in a
fresh process; 256x7M (14.34e9) does not ("past the arena's
comfort", benchmarks/suite.py). EFFECTIVE_ARENA_BYTES sits mid-
bracket; the bracket itself — not the midpoint — is the measured
fact, and :func:`max_t` reproduces the 6M-fits/7M-OOMs boundary for
any value inside it. Round 5 confirmed the model's 6M prediction END
TO END: the full datagen->whiten->fit pipeline at 256x6M runs in a
fresh process (4.94e7 samples/s, benchmarks/maxt_row.py — the
committed suite row was previously 4M only because the in-process
ladder ran on a fragmented arena).
"""

from __future__ import annotations

_ELEM = 4  # f32 bytes; the device pipeline is f32 end to end

# Chip-measured usable ceiling (see module docstring): bracketed by
# 12.29e9 (fits) and 14.34e9 (OOMs) at 256xT, round 4.
EFFECTIVE_ARENA_BYTES = 13.3e9
# The raw arena the runtime reports (context for the gap).
REPORTED_ARENA_BYTES = 15.75e9


def phase_peak_bytes(
    n: int,
    t: int,
    n_features: int | None = None,
    cheap_tier: bool = True,
    use_pallas: bool = True,
) -> dict:
    """Per-phase HBM peaks (bytes) for a datagen→whiten→fit pipeline.

    ``cheap_tier``: the staged-precision schedule keeps a bf16 copy of
    X during its first tier (half a data buffer). ``use_pallas``: the
    fused kernels' grouped moment partials; the XLA path's moment
    temporaries are transient and fusion-managed instead (modeled at
    one extra data buffer for the rotated-Y materialization).
    """
    nf = n_features if n_features is not None else n
    data = nf * t * _ELEM      # raw (n_features, T) buffer
    comp = n * t * _ELEM       # whitened (n_components, T) buffer

    from ..ops.linalg import ROTATE_BLOCK_T

    block = n * min(ROTATE_BLOCK_T, t) * _ELEM

    if use_pallas:
        from ..ops import pallas_kernels as pk

        bt = pk._tile_t(n, t)
        n_tiles = -(-t // bt)
        group = pk._partials_group(n_tiles, n, 2)
        n_groups = -(-n_tiles // group)
        # G + H (n, n) partials plus pm/ysq (n, 1) per group
        core_extra = n_groups * (2 * n * n + 2 * n) * _ELEM
    else:
        core_extra = comp  # XLA path: one rotated-Y materialization

    return {
        "datagen": data + block,                 # in-place mix + block
        "stats": data + 64 * nf * nf * _ELEM,    # chunked cov partials
        "projection": data + comp,               # raw + whitened alive
        "refine": comp + block,                  # in-place re-rotation
        "core": comp + (comp // 2 if cheap_tier else 0) + core_extra,
    }


def fit_peak_bytes(n: int, t: int, **kw) -> int:
    """Pipeline HBM peak: the max over phase peaks."""
    return max(phase_peak_bytes(n, t, **kw).values())


def binding_phase(n: int, t: int, **kw) -> str:
    """Name of the phase that sets the pipeline peak."""
    phases = phase_peak_bytes(n, t, **kw)
    return max(phases, key=phases.get)


def max_t(
    n: int,
    arena_bytes: float = EFFECTIVE_ARENA_BYTES,
    step: int = 1_000_000,
    **kw,
) -> int:
    """Largest T (multiple of ``step``) whose pipeline peak fits.

    Defaults reproduce the round-4 chip measurement: max_t(256) = 6M
    (7M OOMs) — pinned by tests/test_memory_model.py.
    """
    t = step
    while fit_peak_bytes(n, t + step, **kw) <= arena_bytes:
        t += step
    return t
