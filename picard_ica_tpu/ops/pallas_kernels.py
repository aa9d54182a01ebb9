"""Fused Pallas TPU kernels for the Picard hot loop.

The core loop's invariant Y = W @ X (W accumulates every line-search
transform from identity) lets the data matrix stay read-only in HBM:
each pass fuses

    rotate (MXU: W @ x_tile) -> score/log-lik (VPU) -> moment
    contraction (MXU) / row reduction

into ONE kernel that reads each X tile exactly once. Per optimizer
iteration the HBM traffic is (1 + line_search_tries) reads of X and
ZERO N x T writes — the reference's formulation (core.rs:124, 215-221)
materializes psi(Y), psi'(Y), Y^2 and a fresh Y per try.

Accuracy design: each grid step writes its tile-local partial to its
own output slot; the (n_tiles, ...) partials (a few MB) are folded
OUTSIDE the kernel with a pairwise tree (O(log n_tiles * eps) error).
A single running f32 accumulator would be n_tiles adds deep and costs
~2 digits of gradient-norm floor at T = 1M; per-tile partials + tree
fold keep the moment error at the single-tile level, which is what
lets f32 TPU runs converge to tol = 1e-7 (SURVEY.md §7 hard part c).

Resident-W kernels (N up to max_fused_n) cover everything:
  * rotated_moments — G = psi(WX)(WX)^T, E[psi'], optionally
    H = psi'(WX)((WX)^2)^T and E[(WX)^2]  (core.rs:215-276); runs
    once per fit, at initialization
  * rotated_loglik  — row-sums of log_lik(WX) (+ optional E[(WX)^2]),
    the absolute loss's data term (core.rs:73-83); init + extended
    sign-change re-baselines
  * rotated_fused   — THE hot kernel: one line-search try (per-element
    loss delta vs the current W) plus the candidate's full moment set,
    in a single read of X per try

Beyond max_fused_n — or when the (n_tiles, N, N) per-tile partials
would exceed _RESIDENT_PARTIALS_MAX of HBM (quadratic in N: ~10 GB at
N=512/T=4M, where the partial WRITE traffic also exceeds the X read
itself) — the public wrappers dispatch to streaming-W variants
(streaming_fused_sums / streaming_loglik_sums): weights pass
through VMEM as (128, N) row blocks, a per-tile Y scratch feeds the
G/H contractions, and the N x N accumulators live in a VMEM output
block shared by a group of tiles (16x fewer partials) — lifting the
cap to max_streaming_n (~896 with H, ~1152 G-only by the VMEM model;
TPU-calibration pending, see _stream_dims). Larger N still routes to
XLA (solver.py).

All return UNNORMALIZED sums over the local T axis so multi-chip
callers can psum across sample shards before dividing by global T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .densities import Density

_HI = jax.lax.Precision.HIGHEST


# The MXU precision-tier primitives (_split_bf16, _dot_bf16x3,
# _dot_bf16x3_presplit, _kernel_dot) live in ops/precision.py — one
# definition shared with the XLA data path so both compute paths'
# staged-precision semantics stay identical. Re-exported here because
# every kernel body below uses them.
from .precision import (  # noqa: F401  (re-exported)
    _dot_bf16x3,
    _dot_bf16x3_presplit,
    _kernel_dot,
    _split_bf16,
)

_VMEM_BUDGET = 12 * 1024 * 1024  # of the 16MB scoped-VMEM limit
# Peak live (N, bt) f32 buffers (x tile double-buffered by the
# pipeline, rotated copies, score/derivative/log-lik intermediates)
# and resident (N, N) weight blocks, per kernel flavor.
_DELTA_BUFS, _DELTA_WEIGHTS = 11, 2
_PLAIN_BUFS, _PLAIN_WEIGHTS = 8, 1


def _tile_t(n: int, t: int, n_bufs: int = _DELTA_BUFS,
            n_weights: int = _DELTA_WEIGHTS) -> int:
    """Pick a T-tile: multiple of 128 lanes, VMEM-friendly vs N.

    The fused line-search kernel holds the deepest working set (see
    the buffer counts above); the budget keeps it near ~12MB of the
    16MB scoped-VMEM limit (verified to N=256 at T=2M; 2MB x-tiles
    compile-OOM at N=128). Beyond :func:`max_fused_n` the weight
    blocks alone bust the budget — the wrappers dispatch such sizes
    to the streaming-W kernels (and the solver routes past
    max_streaming_n to the XLA path).
    """
    weights = n_weights * n * n * 4
    avail = _VMEM_BUDGET - weights
    budget = max(avail, 0) // (n_bufs * n * 4)
    bt = max(256, min(4096, budget))
    bt = (bt // 128) * 128
    if t <= 512:
        # Tiny inputs (tests): a single lane-rounded tile — but never
        # LARGER than the modeled tile (at the large-N edge of the
        # VMEM budget, growing the tile past the model busts scoped
        # VMEM even though T is small).
        return min(bt, max(128, -(-t // 128) * 128))
    return bt


def max_fused_n(absolute_ll: bool = False) -> int:
    """Largest N whose fused kernel compiles within the 16MB
    scoped-VMEM limit at the minimum 256-lane tile — the routing
    threshold solver.py uses.

    Empirically verified on v5e (Mosaic's true peak includes the
    (1, N, N) output blocks and pipeline double-buffering beyond the
    analytic input-side model): the delta kernel compiles at N=512 and
    OOMs at 576 (measured peak 16.5M at N=704); the plain kernel (one
    resident weight block, no dy intermediates) compiles at 576 and
    OOMs at 640. Larger N routes to the XLA/GSPMD path, which is
    equally MXU-bound at those sizes (the extra materialized-Y HBM
    traffic is not the bottleneck).
    """
    return 576 if absolute_ll else 512


_STREAM_NB = 128  # W row-block height (one MXU tile of output rows)
_STREAM_GROUP = 16  # x-tiles accumulated per G/H output partial

# Resident kernels write one (N, N) partial per x-tile per matrix
# output: fine at the headline shapes (N=64/T=4M: ~16 MB/output) but
# quadratic in N — at N=512/T=4M the G partials alone are ~10 GB of
# HBM (and of write traffic, exceeding the X read itself). Beyond
# this TOTAL-partials budget the wrappers reroute to the grouped /
# streaming variants, whose VMEM group accumulators emit
# _STREAM_GROUP/_COV_GROUP-times fewer partials.
_RESIDENT_PARTIALS_MAX = 2 * 1024**3  # bytes


def _resident_partials_bytes(n_tiles: int, n: int, n_mats: int) -> int:
    """HBM bytes of (n_tiles, N, N) f32 partials for n_mats outputs."""
    return n_mats * n_tiles * n * n * 4


# Group-accumulated resident partials (round 4). Above this per-call
# partials footprint the resident moments/fused kernels accumulate
# _PARTIALS_GROUP consecutive x-tiles into each (N, N) output block
# (same contiguous output-revisit pattern as the grouped covariance /
# streaming kernels) — at N=256/T=4M the ungrouped G partials alone
# are 1.9 GB of HBM *written per line-search call* (~2.3x the X read
# itself once every output is counted; chip-measured compile dumps
# put the 256x5M fit 975 MB past the 15.75 GB arena on partials).
# Below the threshold nothing changes: the pure per-tile + pairwise
# fold design stays BIT-identical (the N<=128 headline shapes write
# a few MB of partials — grouping there would fork their committed
# trajectories for no memory relief).
# Accuracy within a group: `group`-deep sequential f32 adds, then the
# pairwise fold across groups — the documented grouped-covariance /
# streaming-kernel tradeoff (error log2-bounded across groups, tiny
# linear term within one).
_PARTIALS_GROUP = 16
# 96 MB: 6x the N=64/T=4M headline footprint (those shapes stay
# bit-identical) while catching every shape where the partials tax is
# >~10% of the X read (e.g. 256x500k writes 128 MB of partials against
# a 512 MB read — the committed crossover rows' regime).
_PARTIALS_GROUP_THRESHOLD = 96 * 1024**2  # bytes


def _partials_group(n_tiles: int, n: int, n_mats: int) -> int:
    """x-tiles accumulated per output partial (1 = per-tile writes)."""
    if (_resident_partials_bytes(n_tiles, n, n_mats)
            <= _PARTIALS_GROUP_THRESHOLD):
        return 1
    return min(_PARTIALS_GROUP, n_tiles)


def _stream_dims(n: int, need_h: bool, absolute_ll: bool,
                 elem_bytes: int = 4) -> tuple:
    """(bt, npad) for the streaming large-N kernel, or bt=0 if even the
    minimum 128-lane tile busts the VMEM budget.

    The streaming kernel never holds a full (N, N) weight matrix:
    weights stream through VMEM as (128, N) row blocks and the only
    N-sized residents are the Y scratch (npad x bt), the contraction
    temporaries and the G/H accumulator blocks (npad^2 each) — which is
    what lifts the fused-kernel N cap from 512 to 896 (non-ortho,
    G + H resident) / 1152 (ortho, G only) under this VMEM model.
    """
    npad = -(-n // _STREAM_NB) * _STREAM_NB
    acc_outs = (2 if need_h else 1) * npad * npad * 4
    w_blocks = (1 if absolute_ll else 2) * 2 * _STREAM_NB * n * elem_bytes
    per_bt = (
        2 * n * elem_bytes          # x tile, double-buffered
        + npad * 4                  # y_new scratch (f32 accumulate)
        + 3 * npad * 4              # contraction temps (psi, psi', y^2)
        + (4 if absolute_ll else 7) * _STREAM_NB * 4  # rotation temps
    )
    avail = _VMEM_BUDGET - acc_outs - w_blocks
    if avail <= 0:
        return 0, npad
    bt = min(2048, avail // per_bt)
    return (bt // 128) * 128, npad


def max_streaming_n(need_h: bool = True) -> int:
    """Largest N the streaming kernel's VMEM model admits (at the
    minimum 128-lane tile) — the solver's extended routing threshold."""
    n = _STREAM_NB
    best = 0
    while True:
        bt, _ = _stream_dims(n, need_h, absolute_ll=False)
        if bt < 128:
            return best
        best = n
        n += _STREAM_NB


def _mask_cols(i, bt, t, shape):
    """Lane mask for the (possibly partial) last tile."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (i * bt + col) < t


def _acc_dtype(x):
    """Accumulation dtype: bf16 inputs (the cheap tier's halved-HBM X
    copy) still accumulate and reduce in f32."""
    return jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype


def _reduce_partials(partials, dtype):
    """Sum (n_tiles, ...) tile partials without losing the tile-level
    accuracy.

    On f64 (CPU conformance runs) a plain sum is exact enough. On TPU
    f32 there is no real f64 (x64 is off and TPU f64 is emulated), so
    the fold is a pairwise (tree) reduction — unrolled at trace time
    into ~log2(n_tiles) vectorized adds — whose error grows
    O(log n_tiles * eps) instead of a naive fold's O(n_tiles * eps).
    At T = 10M that is the difference between a ~1e-5 and a ~1e-7
    moment floor, i.e. whether tol = 1e-7 is reachable (SURVEY.md §7
    hard part c). A Kahan scan achieves ~the same bound but its
    sequential carry costs ~4% of the iteration.
    """
    if partials.dtype == jnp.float64:
        return jnp.sum(partials, axis=0)

    from .moments import fold_pairwise

    return fold_pairwise(partials).astype(dtype)


def _rotated_moments_kernel(
    w_ref, x_ref, g_ref, pm_ref, h_ref, ysq_ref, *, density, need_h, need_ysq,
    t, bt, acc, group=1,
):
    i = pl.program_id(0)

    if group > 1:
        # Grouped partials: zero the revisited output block at each
        # group start; unused (dummy) outputs stay zero.
        @pl.when(i % group == 0)
        def _init():
            g_ref[...] = jnp.zeros_like(g_ref)
            pm_ref[...] = jnp.zeros_like(pm_ref)
            h_ref[...] = jnp.zeros_like(h_ref)
            ysq_ref[...] = jnp.zeros_like(ysq_ref)

    def emit(ref, val):
        if group > 1:
            ref[0] += val
        else:
            ref[0] = val

    x_t = x_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)

    # bf16 inputs (the cheap tier's X copy) take the native single-pass
    # matmul — Mosaic rejects HIGHEST on bf16 operands, and a 6-pass
    # split of bf16 would be meaningless anyway.
    prec = None if x_t.dtype == jnp.bfloat16 else _HI
    y = jnp.dot(w_ref[...], x_t, preferred_element_type=acc, precision=prec)
    psi, psi_d = density.score_and_der(y)
    if t % bt != 0:
        # psi(0) == 0 for all densities, but psi'(0) != 0 — mask it.
        psi_d = jnp.where(_mask_cols(i, bt, t, psi_d.shape), psi_d, 0.0)

    emit(g_ref, jax.lax.dot_general(
        psi, y, (((1,), (1,)), ((), ())), preferred_element_type=acc, precision=_HI
    ))
    emit(pm_ref, jnp.sum(psi_d, axis=1, keepdims=True))
    if need_h:
        ysq = y * y
        emit(h_ref, jax.lax.dot_general(
            psi_d, ysq, (((1,), (1,)), ((), ())),
            preferred_element_type=acc, precision=_HI,
        ))
    elif group == 1:
        h_ref[0] = jnp.zeros_like(h_ref[0])
    if need_ysq:
        emit(ysq_ref, jnp.sum(y * y, axis=1, keepdims=True))
    elif group == 1:
        ysq_ref[0] = jnp.zeros_like(ysq_ref[0])


@functools.partial(
    jax.jit,
    static_argnames=("density", "need_h", "need_ysq", "interpret",
                     "group_override"),
)
def rotated_moments_sums(
    w, x, density: Density, need_h: bool, need_ysq: bool,
    interpret: bool = False, group_override: int = 0,
):
    """Unnormalized (G_sum, pm_sum, H_sum, ysq_sum) of Y = W @ X.

    Shapes: (N, N), (N,), (N, N), (N,); the h/ysq outputs are zeros
    when their flags are off (kept in the signature so the caller's
    pytree is static). ``group_override`` (tests only) forces the
    partials accumulation group; it is a static argname, so it is part
    of the jit cache key — unlike mutating _PARTIALS_GROUP_THRESHOLD,
    which is read at trace time and would silently reuse stale-group
    executables.
    """
    n, t = x.shape
    bt = _tile_t(n, t)
    n_tiles = pl.cdiv(t, bt)
    group = (min(group_override, n_tiles) if group_override
             else _partials_group(n_tiles, n, 1 + need_h))
    if n > max_fused_n(absolute_ll=True) or _resident_partials_bytes(
        pl.cdiv(n_tiles, group), n, 1 + need_h
    ) > _RESIDENT_PARTIALS_MAX:
        # Resident-W cap (or the GROUPED per-tile-partials HBM budget —
        # only astronomically long T now reaches it) exceeded: the
        # streaming kernel's plain mode computes the identical moment
        # set (its dll/dysq slots are discarded; this path runs once
        # per fit, at initialization).
        out = streaming_fused_sums(
            w, w, x, density, need_h, need_ysq, interpret=interpret,
            absolute_ll=True,
        )
        return out[2], out[3], out[4], out[5]
    n_groups = pl.cdiv(n_tiles, group)
    dtype = _acc_dtype(x)

    kernel = functools.partial(
        _rotated_moments_kernel,
        density=density,
        need_h=need_h,
        need_ysq=need_ysq,
        t=t,
        bt=bt,
        acc=dtype,
        group=group,
    )

    h_dim = n if need_h else 1
    ysq_dim = n if need_ysq else 1

    def spec(rows, cols):
        return pl.BlockSpec(
            (1, rows, cols), lambda i: (i // group, 0, 0),
            memory_space=pltpu.VMEM,
        )

    g, pm, h, ysq = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            spec(n, n),
            spec(n, 1),
            spec(h_dim, h_dim),
            spec(ysq_dim, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, n, n), dtype),
            jax.ShapeDtypeStruct((n_groups, n, 1), dtype),
            jax.ShapeDtypeStruct((n_groups, h_dim, h_dim), dtype),
            jax.ShapeDtypeStruct((n_groups, ysq_dim, 1), dtype),
        ],
        interpret=interpret,
    )(w.astype(x.dtype), x)

    return (
        _reduce_partials(g, dtype),
        _reduce_partials(pm, dtype)[:, 0],
        (_reduce_partials(h, dtype) if need_h
         else jnp.zeros((n, n), dtype)),
        (_reduce_partials(ysq, dtype)[:, 0] if need_ysq
         else jnp.zeros((n,), dtype)),
    )


def _row_sums_kernel(x_ref, out_ref, *, t, bt):
    i = pl.program_id(0)
    x_t = x_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)
    out_ref[0] = jnp.sum(x_t, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_sums(x, interpret: bool = False):
    """Unnormalized per-row sums (the mean's numerator) via per-tile
    partials + tree fold — error ~eps*log2(n_tiles) like
    :func:`covariance_sums`, but crucially it COMPILES in seconds on
    this environment's remote TPU compiler, where the equivalent XLA
    pad/reshape/reduce chunk pipeline does not finish in 580 s.
    (whitening.rs:24-35 is the reference semantics.)
    """
    n, t = x.shape
    # No resident weight blocks and only ~3 live (N, bt) buffers.
    bt = _tile_t(n, t, n_bufs=4, n_weights=0)
    n_tiles = pl.cdiv(t, bt)
    dtype = x.dtype

    kernel = functools.partial(_row_sums_kernel, t=t, bt=bt)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n, 1), dtype),
        interpret=interpret,
    )(x)
    return _reduce_partials(out, dtype)[:, 0]


_COV_GROUP = 16  # x-tiles accumulated per grouped covariance partial
_COV_RESIDENT_MAX_N = 512  # verified per-tile-partials cap (v5e)


def _cov_bt(n: int) -> int:
    """T-tile for the grouped covariance kernels (N > 512).

    Chip-calibrated round 4: the original model (1x accumulator +
    3 (N, bt) buffers) VMEM-OOMed on the v5e at N=600 x T=1M — Mosaic's
    actual scoped allocation was 21.37 MB at bt=1408 vs the 16 MB
    limit, i.e. ~2 accumulator copies plus ~6 (N, bt)-scale buffers
    (x double-buffer, centered/masked copy, mask iota/bool temps, dot
    staging). The budget now charges both, re-verified on chip at
    N=600 and at the model's max N (benchmarks/whiten_accuracy_r4.json).
    """
    avail = _VMEM_BUDGET - 2 * n * n * 4
    if avail <= 0:
        return 0
    return min(2048, avail // (6 * n * 4)) // 128 * 128


def max_pallas_cov_n() -> int:
    """Largest N the grouped covariance kernel's VMEM model admits —
    whitening's accurate-path routing threshold (beyond it the TPU
    covariance falls to a single f32 dot, with an AccuracyWarning)."""
    n = _COV_RESIDENT_MAX_N
    while _cov_bt(n + 128) >= 128:
        n += 128
    return n


def _grouped_cov_kernel(x_ref, out_ref, *, t, bt, group, acc, mean_ref=None):
    i = pl.program_id(0)

    @pl.when(i % group == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x_t = x_ref[...]
    if mean_ref is not None:
        # Center BEFORE masking: padding lanes must contribute exactly
        # 0 to the partial, not (-mean)^2.
        x_t = x_t - mean_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)
    out_ref[0] += jax.lax.dot_general(
        x_t, x_t, (((1,), (1,)), ((), ())),
        preferred_element_type=acc, precision=_HI,
    )


def _grouped_covariance(x, mean, interpret: bool):
    """``(X - mean)(X - mean)^T`` (or plain ``X X^T`` when mean is
    None) via group-shared VMEM accumulators — the same contiguous
    output-revisit pattern as the streaming fused kernel, extending
    the accurate (non-single-dot) covariance past the per-tile
    kernels' N=512 cap. Error: `group`-deep f32 adds inside a group +
    pairwise fold across groups (vs pure per-tile + pairwise below the
    cap; both are orders of magnitude below the single dot's
    ~sqrt(T)*eps that the whitening eigengap analysis rules out)."""
    n, t = x.shape
    dtype = x.dtype
    bt = _cov_bt(n)
    if bt < 128:
        raise ValueError(
            f"N={n} exceeds the grouped covariance VMEM model "
            f"(max_pallas_cov_n() = {max_pallas_cov_n()})"
        )
    if t <= 512:
        # Single lane-rounded tile, capped by the VMEM-modeled bt (a
        # larger-than-modeled tile busts scoped VMEM at the large-N
        # edge regardless of T).
        bt = min(bt, max(128, -(-t // 128) * 128))
    n_tiles = pl.cdiv(t, bt)
    group = min(_COV_GROUP, n_tiles)
    n_groups = pl.cdiv(n_tiles, group)

    centered = mean is not None
    kernel = functools.partial(
        _grouped_cov_kernel, t=t, bt=bt, group=group, acc=dtype,
    )
    if centered:
        base = kernel

        def kernel(mean_ref, x_ref, out_ref):
            base(x_ref, out_ref, mean_ref=mean_ref)

    in_specs = ([pl.BlockSpec((n, 1), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] if centered else []) + [
        pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    operands = (
        (mean.astype(dtype).reshape(n, 1), x) if centered else (x,)
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n, n), lambda i: (i // group, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, n, n), dtype),
        interpret=interpret,
    )(*operands)
    return _reduce_partials(out, dtype)


def _covariance_kernel(x_ref, out_ref, *, t, bt, acc):
    i = pl.program_id(0)
    x_t = x_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)
    out_ref[0] = jax.lax.dot_general(
        x_t, x_t, (((1,), (1,)), ((), ())),
        preferred_element_type=acc, precision=_HI,
    )


def _centered_covariance_kernel(mean_ref, x_ref, out_ref, *, t, bt, acc):
    i = pl.program_id(0)
    # Subtract the per-row mean BEFORE masking: padding lanes must
    # contribute exactly 0 to the partial, not (-mean)^2.
    x_t = x_ref[...] - mean_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)
    out_ref[0] = jax.lax.dot_general(
        x_t, x_t, (((1,), (1,)), ((), ())),
        preferred_element_type=acc, precision=_HI,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def covariance_sums(x, interpret: bool = False):
    """Unnormalized ``X X^T`` via per-tile partials + tree fold.

    Accuracy: each (N, bt) tile contributes one f32 MXU partial
    (~eps*sqrt(bt) relative) and the cross-tile fold is pairwise, so
    the total error is ~eps*log2(n_tiles) instead of the single-dot
    ~eps*sqrt(T) — which matters because whitening eigenvectors
    amplify covariance noise by 1/eigengap (ops/whitening.py).
    Also compiles in seconds where the equivalent XLA chunked
    scan/einsum takes minutes through this environment's remote
    compiler.
    """
    n, t = x.shape
    # True working set: the x tile (pipeline double-buffered) + its
    # masked copy, and the double-buffered (1, N, N) output block —
    # far shallower than the fused kernel's default model. Two spare
    # buffers cover the mask iota/bool temps and Mosaic's
    # beyond-the-model allocations (measured up to ~4.5MB over the
    # analytic input-side model on the fused kernel at its N cap);
    # tighten after on-chip calibration at N≈512 (runbook step 12a).
    bt = _tile_t(n, t, n_bufs=6, n_weights=2)
    if n > _COV_RESIDENT_MAX_N or _resident_partials_bytes(
        pl.cdiv(t, bt), n, 1
    ) > _RESIDENT_PARTIALS_MAX:
        return _grouped_covariance(x, None, interpret)
    n_tiles = pl.cdiv(t, bt)
    dtype = x.dtype

    kernel = functools.partial(_covariance_kernel, t=t, bt=bt, acc=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n, n), dtype),
        interpret=interpret,
    )(x)
    return _reduce_partials(out, dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def centered_covariance_sums(x, mean, interpret: bool = False):
    """Unnormalized ``(X - mean)(X - mean)^T`` in ONE read of X.

    Same accuracy design as :func:`covariance_sums`; the centering is
    folded into the tile load so the centered copy of X is never
    materialized in HBM (the separate center -> covariance pipeline
    costs an extra N x T write + read).
    """
    n, t = x.shape
    # x tile (double-buffered) + centered/masked copy + the
    # double-buffered (1, N, N) output block, plus two spares for mask
    # temps / Mosaic margin (see covariance_sums; calibration pending).
    bt = _tile_t(n, t, n_bufs=7, n_weights=2)
    if n > _COV_RESIDENT_MAX_N or _resident_partials_bytes(
        pl.cdiv(t, bt), n, 1
    ) > _RESIDENT_PARTIALS_MAX:
        return _grouped_covariance(x, mean, interpret)
    n_tiles = pl.cdiv(t, bt)
    dtype = x.dtype

    kernel = functools.partial(_centered_covariance_kernel, t=t, bt=bt, acc=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n, n), dtype),
        interpret=interpret,
    )(mean.astype(dtype).reshape(n, 1), x)
    return _reduce_partials(out, dtype)


def _rotated_loglik_kernel(
    m_ref, x_ref, ll_ref, ysq_ref, *, density, need_ysq, t, bt, acc
):
    i = pl.program_id(0)

    x_t = x_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)

    prec = None if x_t.dtype == jnp.bfloat16 else _HI
    y = jnp.dot(m_ref[...], x_t, preferred_element_type=acc, precision=prec)
    ll = density.log_lik(y)
    if t % bt != 0:
        # log_lik(0) != 0 (e.g. tanh: log(2)/alpha) — mask the padding.
        ll = jnp.where(_mask_cols(i, bt, t, ll.shape), ll, 0.0)

    ll_ref[0] = jnp.sum(ll, axis=1, keepdims=True)
    if need_ysq:
        ysq_ref[0] = jnp.sum(y * y, axis=1, keepdims=True)
    else:
        ysq_ref[0] = jnp.zeros_like(ysq_ref[0])


@functools.partial(jax.jit, static_argnames=("density", "need_ysq", "interpret"))
def rotated_loglik_sums(
    m, x, density: Density, need_ysq: bool, interpret: bool = False
):
    """Unnormalized (loglik_rowsums, ysq_rowsums) of Y = M @ X.

    This is the line-search loss's data term WITHOUT materializing the
    candidate Y' in HBM — rejected line-search steps cost one read of
    X and no writes.
    """
    n, t = x.shape
    if n > max_fused_n(absolute_ll=True):
        return streaming_loglik_sums(
            m, x, density, need_ysq, interpret=interpret
        )
    # x tile (double-buffered) + masked copy + y + ll + ysq buffers,
    # one resident M block, plus two spares for mask temps / Mosaic
    # margin (see covariance_sums; calibration pending); the
    # (n_tiles, N, 1) row partials are tiny (no HBM-partials routing).
    bt = _tile_t(n, t, n_bufs=9, n_weights=1)
    n_tiles = pl.cdiv(t, bt)
    dtype = _acc_dtype(x)

    kernel = functools.partial(
        _rotated_loglik_kernel, density=density, need_ysq=need_ysq, t=t, bt=bt,
        acc=dtype,
    )

    ll, ysq = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, n, 1), dtype),
            jax.ShapeDtypeStruct((n_tiles, n, 1), dtype),
        ],
        interpret=interpret,
    )(m.astype(x.dtype), x)
    return _reduce_partials(ll, dtype)[:, 0], _reduce_partials(ysq, dtype)[:, 0]


def _rotated_fused_kernel(
    m_new_ref, m_old_ref, x_ref, dll_ref, dysq_ref, g_ref, pm_ref, h_ref,
    ysq_ref, *, density, need_h, need_ysq, t, bt, acc, precision,
    absolute_ll, group=1,
):
    """Line-search try + speculative moments in ONE read of the X tile.

    Computes the loss delta of candidate M_new against M_old AND the
    raw moments of Y_new = M_new @ X. When the try is accepted (the
    common case: alpha = 1 succeeds), the next optimizer iteration's
    moment pass is already done — the standalone moments kernel runs
    only once, at initialization. Per accepted iteration: 3 MXU
    contractions + 1 HBM read of X (vs 4 and 2 for separate
    moments/delta passes), and the density's transcendental is
    evaluated once for score/derivative/log-lik together.
    """
    i = pl.program_id(0)

    if group > 1:
        # Grouped partials (see _partials_group): zero the revisited
        # output blocks at each group start.
        @pl.when(i % group == 0)
        def _init():
            dll_ref[...] = jnp.zeros_like(dll_ref)
            dysq_ref[...] = jnp.zeros_like(dysq_ref)
            g_ref[...] = jnp.zeros_like(g_ref)
            pm_ref[...] = jnp.zeros_like(pm_ref)
            h_ref[...] = jnp.zeros_like(h_ref)
            ysq_ref[...] = jnp.zeros_like(ysq_ref)

    def emit(ref, val):
        if group > 1:
            ref[0] += val
        else:
            ref[0] = val

    def emit_zero(ref):
        if group == 1:
            ref[0] = jnp.zeros_like(ref[0])

    x_t = x_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)

    mm_dims = (((1,), (0,)), ((), ()))
    ct_dims = (((1,), (1,)), ((), ()))

    if absolute_ll:
        # PLAIN mode (cheap tiers): one rotation dot and the absolute
        # per-row log-lik sums in the dll/dysq slots — about half the
        # VPU transcendentals of the delta form. The caller's accept
        # test is then a direct f32 subtraction against the carried
        # loss (resolution ~1e-4 absolute, ample for the bf16 range).
        y_new = _kernel_dot(m_new_ref[...], x_t, mm_dims, acc, precision)
        psi, psi_d, ll = density.score_der_loglik(y_new)
        if t % bt != 0:
            mask = _mask_cols(i, bt, t, psi_d.shape)
            psi_d = jnp.where(mask, psi_d, 0.0)
            # log_lik(0) != 0 (e.g. tanh: log(2)/alpha) — mask padding.
            ll = jnp.where(mask, ll, 0.0)
        emit(dll_ref, jnp.sum(ll, axis=1, keepdims=True))
        if need_ysq:
            emit(dysq_ref, jnp.sum(y_new * y_new, axis=1, keepdims=True))
        else:
            emit_zero(dysq_ref)
    else:
        # Rotate the CURRENT matrix and the candidate DELTA, not two
        # absolute rotations: dy = (M_new - M_old) @ x is small near
        # convergence and carries full relative precision, so the loss
        # delta below is cancellation-free (error ~eps * |dy| per
        # element instead of ~eps * |log_lik| for a direct
        # ll_new - ll_old — the difference between a line search that
        # resolves true decreases at any tolerance and one whose
        # accepts go noise-driven below gnorm ~1e-5).
        dm = m_new_ref[...] - m_old_ref[...]
        if precision == "bf16x3" and acc != jnp.float64:
            # One shared bf16 hi/lo split of the X tile feeds both
            # rotation dots (identical arithmetic to two _kernel_dot
            # calls, minus the duplicate N x bt split).
            x_pair = _split_bf16(x_t)
            y_old = _dot_bf16x3_presplit(
                _split_bf16(m_old_ref[...]), x_pair, mm_dims, acc)
            dy = _dot_bf16x3_presplit(_split_bf16(dm), x_pair, mm_dims, acc)
        else:
            y_old = _kernel_dot(m_old_ref[...], x_t, mm_dims, acc, precision)
            dy = _kernel_dot(dm, x_t, mm_dims, acc, precision)
        y_new = y_old + dy

        # One fused density call: score/derivative of the candidate and
        # the cancellation-free loss delta share their transcendentals;
        # exact 0 at the (0, 0) padding.
        psi, psi_d, dll = density.score_der_loglik_delta(y_old, dy)
        if t % bt != 0:
            psi_d = jnp.where(_mask_cols(i, bt, t, psi_d.shape), psi_d, 0.0)
        emit(dll_ref, jnp.sum(dll, axis=1, keepdims=True))
        if need_ysq:
            # y_new^2 - y_old^2 = (2 y_old + dy) dy — cancellation-free.
            emit(dysq_ref, jnp.sum(
                (2.0 * y_old + dy) * dy, axis=1, keepdims=True
            ))
        else:
            emit_zero(dysq_ref)

    emit(g_ref, _kernel_dot(psi, y_new, ct_dims, acc, precision))
    emit(pm_ref, jnp.sum(psi_d, axis=1, keepdims=True))

    if need_ysq:
        emit(ysq_ref, jnp.sum(y_new * y_new, axis=1, keepdims=True))
    else:
        emit_zero(ysq_ref)
    if need_h:
        emit(h_ref, _kernel_dot(psi_d, y_new * y_new, ct_dims, acc, precision))
    else:
        emit_zero(h_ref)


@functools.partial(
    jax.jit,
    static_argnames=(
        "density", "need_h", "need_ysq", "interpret", "precision",
        "absolute_ll", "group_override",
    ),
)
def rotated_fused_sums(
    m_new, m_old, x, density: Density, need_h: bool, need_ysq: bool,
    interpret: bool = False, precision: str = "f32",
    absolute_ll: bool = False, group_override: int = 0,
):
    """Unnormalized fused line-search-try + moments sums.

    Returns ``(dll, dysq, g, pm, h, ysq)`` where dll/dysq are the
    per-row sums of ``log_lik(M_new X) - log_lik(M_old X)`` (and the
    Y^2 delta), and g/pm/h/ysq are the raw moment sums of
    ``Y = M_new @ X`` as in :func:`rotated_moments_sums`. With
    ``absolute_ll=True`` the dll/dysq slots hold the ABSOLUTE
    ``log_lik(M_new X)`` / ``(M_new X)^2`` row sums instead (the plain
    cheap-tier accept path; m_old is ignored).
    """
    n, t = x.shape
    if absolute_ll:
        bt = _tile_t(n, t, _PLAIN_BUFS, _PLAIN_WEIGHTS)
    else:
        bt = _tile_t(n, t)
    n_tiles_full = pl.cdiv(t, bt)
    group = (min(group_override, n_tiles_full) if group_override
             else _partials_group(n_tiles_full, n, 1 + need_h))
    if n > max_fused_n(absolute_ll) or _resident_partials_bytes(
        pl.cdiv(n_tiles_full, group), n, 1 + need_h
    ) > _RESIDENT_PARTIALS_MAX:
        return streaming_fused_sums(
            m_new, m_old, x, density, need_h, need_ysq,
            interpret=interpret, precision=precision,
            absolute_ll=absolute_ll,
        )
    if x.dtype == jnp.bfloat16 and precision == "f32":
        # Mosaic rejects HIGHEST on bf16 operands, and a multi-pass
        # split of bf16 data is meaningless — bf16 X (the cheap tier's
        # halved-HBM copy) always takes the native single-pass matmul
        # with f32 accumulation (same remap as the streaming variant).
        precision = "bf16"
    n_tiles = n_tiles_full
    n_groups = pl.cdiv(n_tiles, group)
    dtype = _acc_dtype(x)

    kernel = functools.partial(
        _rotated_fused_kernel, density=density, need_h=need_h,
        need_ysq=need_ysq, t=t, bt=bt, acc=dtype, precision=precision,
        absolute_ll=absolute_ll, group=group,
    )
    if absolute_ll:
        # The plain kernel never reads m_old — don't make Mosaic keep a
        # second (N, N) weight block resident (this is what makes the
        # _PLAIN_WEIGHTS=1 tile model true, and what buys the plain
        # kernel its higher max_fused_n).
        inner = kernel

        def kernel(m_new_ref, x_ref, *out_refs):
            inner(m_new_ref, None, x_ref, *out_refs)

    # Unused outputs shrink to (1, 1) dummies: a full (n_tiles, N, N)
    # zero H-partial costs ~585 MB of HBM at N=256/T=2M per live call
    # — enough to OOM the chip at BASELINE config-5 scale.
    h_dim = n if need_h else 1
    ysq_dim = n if need_ysq else 1

    def spec(rows, cols):
        return pl.BlockSpec(
            (1, rows, cols), lambda i: (i // group, 0, 0),
            memory_space=pltpu.VMEM,
        )

    w_spec = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [w_spec] * (1 if absolute_ll else 2) + [
        pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    operands = (
        (m_new.astype(x.dtype), x)
        if absolute_ll
        else (m_new.astype(x.dtype), m_old.astype(x.dtype), x)
    )
    dll, dysq, g, pm, h, ysq = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            spec(n, 1),
            spec(ysq_dim, 1),
            spec(n, n),
            spec(n, 1),
            spec(h_dim, h_dim),
            spec(ysq_dim, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, n, 1), dtype),
            jax.ShapeDtypeStruct((n_groups, ysq_dim, 1), dtype),
            jax.ShapeDtypeStruct((n_groups, n, n), dtype),
            jax.ShapeDtypeStruct((n_groups, n, 1), dtype),
            jax.ShapeDtypeStruct((n_groups, h_dim, h_dim), dtype),
            jax.ShapeDtypeStruct((n_groups, ysq_dim, 1), dtype),
        ],
        interpret=interpret,
    )(*operands)

    return (
        _reduce_partials(dll, dtype)[:, 0],
        (_reduce_partials(dysq, dtype)[:, 0] if need_ysq
         else jnp.zeros((n,), dtype)),
        _reduce_partials(g, dtype),
        _reduce_partials(pm, dtype)[:, 0],
        (_reduce_partials(h, dtype) if need_h
         else jnp.zeros((n, n), dtype)),
        (_reduce_partials(ysq, dtype)[:, 0] if need_ysq
         else jnp.zeros((n,), dtype)),
    )


def _streaming_fused_kernel(
    m_new_ref, m_old_ref, x_ref, dll_ref, dysq_ref, g_ref, pm_ref, h_ref,
    ysq_ref, y_scr, *, density, need_h, need_ysq, t, bt, acc, precision,
    absolute_ll, n_blocks, group,
):
    """Large-N fused step: W streams through VMEM in (128, N) row
    blocks instead of sitting resident.

    Grid (i, p) with p minor: phases p < n_blocks rotate row block p of
    the candidate against the x tile (resident across all phases of a
    tile), emit that block's line-search / row-moment partials, and park
    y_new in the Y scratch; the final phase p == n_blocks recomputes
    psi/psi' from the completed (npad, bt) Y scratch (one extra VPU
    transcendental pass — cheap next to the O(N^2 bt) MXU work at these
    sizes) and accumulates the G/H contractions into an output block
    shared by `group` consecutive tiles (revisited contiguously, so the
    accumulator lives in VMEM; sequential depth `group` on top of the
    per-tile MXU partial, vs the per-tile-partials + pairwise fold of
    the resident-W kernel). Padding rows of W are zero-filled by the
    wrapper, so padded Y rows are exactly 0 and every padded
    G/H/stat entry dies at the final slice.
    """
    i = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(jnp.logical_and(i % group == 0, p == 0))
    def _init_accumulators():
        g_ref[...] = jnp.zeros_like(g_ref)
        if need_h:
            h_ref[...] = jnp.zeros_like(h_ref)

    mm_dims = (((1,), (0,)), ((), ()))
    ct_dims = (((1,), (1,)), ((), ()))

    @pl.when(p < n_blocks)
    def _rotate_block():
        x_t = x_ref[...]
        if t % bt != 0:
            x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)

        if absolute_ll:
            y_new = _kernel_dot(m_new_ref[...], x_t, mm_dims, acc, precision)
            psi, psi_d, ll = density.score_der_loglik(y_new)
            if t % bt != 0:
                mask = _mask_cols(i, bt, t, psi_d.shape)
                psi_d = jnp.where(mask, psi_d, 0.0)
                ll = jnp.where(mask, ll, 0.0)
            dll_ref[0] = jnp.sum(ll, axis=1, keepdims=True)
            if need_ysq:
                dysq_ref[0] = jnp.sum(y_new * y_new, axis=1, keepdims=True)
            else:
                dysq_ref[0] = jnp.zeros_like(dysq_ref[0])
        else:
            dm = m_new_ref[...] - m_old_ref[...]
            if precision == "bf16x3" and acc != jnp.float64:
                # Shared X-tile split — see _rotated_fused_kernel.
                x_pair = _split_bf16(x_t)
                y_old = _dot_bf16x3_presplit(
                    _split_bf16(m_old_ref[...]), x_pair, mm_dims, acc)
                dy = _dot_bf16x3_presplit(
                    _split_bf16(dm), x_pair, mm_dims, acc)
            else:
                y_old = _kernel_dot(
                    m_old_ref[...], x_t, mm_dims, acc, precision)
                dy = _kernel_dot(dm, x_t, mm_dims, acc, precision)
            y_new = y_old + dy
            psi, psi_d, dll = density.score_der_loglik_delta(y_old, dy)
            if t % bt != 0:
                psi_d = jnp.where(_mask_cols(i, bt, t, psi_d.shape), psi_d, 0.0)
            dll_ref[0] = jnp.sum(dll, axis=1, keepdims=True)
            if need_ysq:
                dysq_ref[0] = jnp.sum(
                    (2.0 * y_old + dy) * dy, axis=1, keepdims=True
                )
            else:
                dysq_ref[0] = jnp.zeros_like(dysq_ref[0])

        pm_ref[0] = jnp.sum(psi_d, axis=1, keepdims=True)
        if need_ysq:
            ysq_ref[0] = jnp.sum(y_new * y_new, axis=1, keepdims=True)
        else:
            ysq_ref[0] = jnp.zeros_like(ysq_ref[0])
        y_scr[p] = y_new.astype(y_scr.dtype)

    @pl.when(p == n_blocks)
    def _contract():
        # (npad, bt) assembled from the per-block scratch slots; psi
        # and psi' are recomputed here rather than parked in two more
        # npad x bt scratches.
        y_full = jnp.concatenate(
            [y_scr[b] for b in range(n_blocks)], axis=0
        )
        psi, psi_d = density.score_and_der(y_full)
        # psi(0) == 0 at both column padding (masked x) and row padding
        # (zero W rows), so G needs no masking; H's right operand y^2
        # is 0 at the same places, which kills psi'(0) != 0 there too.
        g_ref[0] += _kernel_dot(psi, y_full, ct_dims, acc, precision)
        if need_h:
            h_ref[0] += _kernel_dot(
                psi_d, y_full * y_full, ct_dims, acc, precision
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "density", "need_h", "need_ysq", "interpret", "precision",
        "absolute_ll",
    ),
)
def streaming_fused_sums(
    m_new, m_old, x, density: Density, need_h: bool, need_ysq: bool,
    interpret: bool = False, precision: str = "f32",
    absolute_ll: bool = False,
):
    """:func:`rotated_fused_sums` semantics for N beyond the resident-W
    kernels' VMEM cap (see :func:`_stream_dims`); same return tuple."""
    n, t = x.shape
    dtype = _acc_dtype(x)
    if x.dtype == jnp.bfloat16 and precision == "f32":
        # Mirror the resident kernels: Mosaic rejects HIGHEST on bf16
        # operands, and a multi-pass split of bf16 is meaningless —
        # bf16 X (the cheap tier's halved-HBM copy) always takes the
        # native single-pass matmul with f32 accumulation.
        precision = "bf16"
    elem = jnp.dtype(x.dtype).itemsize
    bt, npad = _stream_dims(n, need_h, absolute_ll, elem)
    if bt < 128:
        raise ValueError(
            f"N={n} exceeds the streaming kernel's VMEM model "
            f"(max_streaming_n(need_h={need_h}) = {max_streaming_n(need_h)})"
        )
    if t <= 512:
        # Single lane-rounded tile, capped by the VMEM-modeled bt (a
        # larger-than-modeled tile busts scoped VMEM at the large-N
        # edge regardless of T).
        bt = min(bt, max(128, -(-t // 128) * 128))
    n_blocks = npad // _STREAM_NB
    n_tiles = pl.cdiv(t, bt)
    group = min(_STREAM_GROUP, n_tiles)
    n_groups = pl.cdiv(n_tiles, group)

    kernel = functools.partial(
        _streaming_fused_kernel, density=density, need_h=need_h,
        need_ysq=need_ysq, t=t, bt=bt, acc=dtype, precision=precision,
        absolute_ll=absolute_ll, n_blocks=n_blocks, group=group,
    )
    if absolute_ll:
        inner = kernel

        def kernel(m_new_ref, x_ref, *refs):
            inner(m_new_ref, None, x_ref, *refs)

    last = n_blocks - 1

    def w_idx(i, p):
        return (jnp.minimum(p, last), 0)

    def stat_idx(i, p):
        return (i, jnp.minimum(p, last), 0)

    def dummy_idx(i, p):
        return (i, 0, 0)

    def acc_idx(i, p):
        return (i // group, 0, 0)

    nb = _STREAM_NB
    ysq_rows = nb if need_ysq else 1
    ysq_dim1 = npad if need_ysq else 1
    h_dim = npad if need_h else 1

    w_spec = pl.BlockSpec((nb, n), w_idx, memory_space=pltpu.VMEM)
    in_specs = [w_spec] * (1 if absolute_ll else 2) + [
        pl.BlockSpec((n, bt), lambda i, p: (0, i), memory_space=pltpu.VMEM),
    ]

    def stat_spec(rows):
        idx = stat_idx if rows == nb else dummy_idx
        return pl.BlockSpec((1, rows, 1), idx, memory_space=pltpu.VMEM)

    pad_w = npad - n

    def prep(m):
        m = m.astype(x.dtype)
        return jnp.pad(m, ((0, pad_w), (0, 0))) if pad_w else m

    operands = (
        (prep(m_new), x) if absolute_ll
        else (prep(m_new), prep(m_old), x)
    )
    dll, dysq, g, pm, h, ysq = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_blocks + 1),
        in_specs=in_specs,
        out_specs=[
            stat_spec(nb),
            stat_spec(ysq_rows),
            pl.BlockSpec((1, npad, npad), acc_idx, memory_space=pltpu.VMEM),
            stat_spec(nb),
            pl.BlockSpec((1, h_dim, h_dim), acc_idx, memory_space=pltpu.VMEM),
            stat_spec(ysq_rows),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, npad, 1), dtype),
            jax.ShapeDtypeStruct((n_tiles, ysq_dim1, 1), dtype),
            jax.ShapeDtypeStruct((n_groups, npad, npad), dtype),
            jax.ShapeDtypeStruct((n_tiles, npad, 1), dtype),
            jax.ShapeDtypeStruct((n_groups, h_dim, h_dim), dtype),
            jax.ShapeDtypeStruct((n_tiles, ysq_dim1, 1), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n_blocks, nb, bt), dtype)],
        interpret=interpret,
    )(*operands)

    return (
        _reduce_partials(dll, dtype)[:n, 0],
        (_reduce_partials(dysq, dtype)[:n, 0] if need_ysq
         else jnp.zeros((n,), dtype)),
        _reduce_partials(g, dtype)[:n, :n],
        _reduce_partials(pm, dtype)[:n, 0],
        (_reduce_partials(h, dtype)[:n, :n] if need_h
         else jnp.zeros((n, n), dtype)),
        (_reduce_partials(ysq, dtype)[:n, 0] if need_ysq
         else jnp.zeros((n,), dtype)),
    )


def _streaming_loglik_kernel(
    m_ref, x_ref, ll_ref, ysq_ref, *, density, need_ysq, t, bt, acc
):
    i = pl.program_id(0)
    x_t = x_ref[...]
    if t % bt != 0:
        x_t = jnp.where(_mask_cols(i, bt, t, x_t.shape), x_t, 0.0)
    prec = None if x_t.dtype == jnp.bfloat16 else _HI
    y = jnp.dot(m_ref[...], x_t, preferred_element_type=acc, precision=prec)
    ll = density.log_lik(y)
    if t % bt != 0:
        ll = jnp.where(_mask_cols(i, bt, t, ll.shape), ll, 0.0)
    ll_ref[0] = jnp.sum(ll, axis=1, keepdims=True)
    if need_ysq:
        ysq_ref[0] = jnp.sum(y * y, axis=1, keepdims=True)
    else:
        ysq_ref[0] = jnp.zeros_like(ysq_ref[0])


@functools.partial(jax.jit, static_argnames=("density", "need_ysq", "interpret"))
def streaming_loglik_sums(
    m, x, density: Density, need_ysq: bool, interpret: bool = False
):
    """:func:`rotated_loglik_sums` for large N: M streams in (128, N)
    row blocks (grid (tile, block), no contraction phase). Used only at
    loss (re)baselines, so the N^2 x 4 bytes/tile of extra M traffic is
    immaterial."""
    n, t = x.shape
    dtype = _acc_dtype(x)
    npad = -(-n // _STREAM_NB) * _STREAM_NB
    elem = jnp.dtype(x.dtype).itemsize
    # No N x N accumulators here — only the M row block, the x tile
    # and three (128, bt) intermediates bound the budget.
    avail = _VMEM_BUDGET - 2 * _STREAM_NB * n * elem
    bt = min(2048, max(avail, 0) // (2 * n * elem + 3 * _STREAM_NB * 4))
    bt = bt // 128 * 128
    if bt < 128:
        raise ValueError(f"N={n} exceeds the streaming log-lik VMEM model")
    if t <= 512:
        # Single lane-rounded tile, capped by the VMEM-modeled bt (a
        # larger-than-modeled tile busts scoped VMEM at the large-N
        # edge regardless of T).
        bt = min(bt, max(128, -(-t // 128) * 128))
    n_blocks = npad // _STREAM_NB
    n_tiles = pl.cdiv(t, bt)
    nb = _STREAM_NB

    kernel = functools.partial(
        _streaming_loglik_kernel, density=density, need_ysq=need_ysq,
        t=t, bt=bt, acc=dtype,
    )
    pad_w = npad - n
    m = m.astype(x.dtype)
    if pad_w:
        m = jnp.pad(m, ((0, pad_w), (0, 0)))
    ysq_rows = nb if need_ysq else 1
    ysq_dim1 = npad if need_ysq else 1

    def stat_idx(i, p):
        return (i, p, 0)

    ll, ysq = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec((nb, n), lambda i, p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i, p: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nb, 1), stat_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ysq_rows, 1),
                stat_idx if need_ysq else (lambda i, p: (i, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, npad, 1), dtype),
            jax.ShapeDtypeStruct((n_tiles, ysq_dim1, 1), dtype),
        ],
        interpret=interpret,
    )(m, x)
    return (
        _reduce_partials(ll, dtype)[:n, 0],
        (_reduce_partials(ysq, dtype)[:n, 0] if need_ysq
         else jnp.zeros((n,), dtype)),
    )


