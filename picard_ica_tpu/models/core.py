"""Core Picard optimizer loop, TPU-native.

Re-design of the reference's imperative hot loop (src/core.rs:162-401)
as a single jitted ``lax.while_loop`` over an immutable carry:

  * the L-BFGS memory (Vec push/remove in core.rs:296-312) becomes a
    fixed-shape (m, N, N) ring with a validity count, so shapes are
    static under jit;
  * the backtracking line search with early return (core.rs:99-150)
    becomes an inner ``lax.while_loop`` with an accept flag;
  * the gradient-descent fallback (core.rs:349-364) and the extended
    sign-change memory flush (core.rs:317-331) are ``lax.cond``s;
  * the density is a static argument, so tanh/exp/cube elementwise math
    is baked into the trace and fuses into the moment contractions.

Data layout: Y is (n_components, n_samples); the samples axis may be
sharded over a 1-D device mesh. Every T-axis contraction lives in
ops/moments.py (XLA) or ops/pallas_kernels.py (fused TPU kernels) and
reduces with psum under SPMD; all N x N algebra here is replicated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.densities import Density
from ..ops.linalg import matrix_exp, skew_symmetric
from ..ops.moments import (
    compute_raw_moments_xla,
    loglik_rowmeans_xla,
)

# Penalty loss for singular/failed evaluations (core.rs:90-96).
_SINGULAR_LOSS = 1e15
# Hard-coded fallback line-search tries (core.rs:361).
_FALLBACK_LS_TRIES = 10
# Skip L-BFGS pairs whose curvature denominator is ~0/-inf (core.rs:299-311).


@dataclasses.dataclass(frozen=True)
class CoreOptions:
    """Static (trace-time) configuration of the core loop."""

    density: Density
    ortho: bool
    extended: bool
    has_cov: bool
    m: int
    ls_tries: int
    verbose: bool = False
    data_sharding: Any = None  # optional NamedSharding for Y (None, "samples")
    use_pallas: bool = False


class LbfgsMemory(NamedTuple):
    """Fixed-shape L-BFGS ring: slot j < count holds the j-th oldest pair."""

    s_mem: jnp.ndarray  # (m, N, N)
    y_mem: jnp.ndarray  # (m, N, N)
    r_mem: jnp.ndarray  # (m,)
    count: jnp.ndarray  # i32 scalar


class CoreState(NamedTuple):
    w: jnp.ndarray  # (N, N) replicated
    y: jnp.ndarray  # (N, T) sharded over samples
    loss: jnp.ndarray
    signs: jnp.ndarray  # (N,)
    old_signs: jnp.ndarray  # (N,)
    c: jnp.ndarray  # (N, N) extended covariance proxy
    g_old: jnp.ndarray  # (N, N)
    prev_step: jnp.ndarray  # (N, N)
    memory: LbfgsMemory
    it: jnp.ndarray  # i32
    n_iter_done: jnp.ndarray  # i32
    gradient_norm: jnp.ndarray
    converged: jnp.ndarray  # bool


class CoreResult(NamedTuple):
    y: jnp.ndarray
    w: jnp.ndarray
    converged: jnp.ndarray
    gradient_norm: jnp.ndarray
    n_iterations: jnp.ndarray
    signs: jnp.ndarray


def _constrain(y, opts: CoreOptions):
    if opts.data_sharding is not None:
        return lax.with_sharding_constraint(y, opts.data_sharding)
    return y


def _compute_raw_moments(y, opts: CoreOptions, need_h: bool, need_ysq: bool):
    if opts.use_pallas:
        from ..ops.pallas_kernels import compute_raw_moments_fused

        return compute_raw_moments_fused(y, opts.density, need_h, need_ysq)
    return compute_raw_moments_xla(y, opts.density, need_h, need_ysq)


def _loglik_rowmeans(y, opts: CoreOptions):
    if opts.use_pallas:
        from ..ops.pallas_kernels import loglik_rowmeans_fused

        return loglik_rowmeans_fused(y, opts.density)
    return loglik_rowmeans_xla(y, opts.density)


def compute_loss(y, w, signs, opts: CoreOptions):
    """Negative log-likelihood objective (core.rs:39-85).

    Singular W maps to the 1e15 penalty (core.rs:90-96) instead of an
    error so the line search steers away from it.
    """
    dtype = y.dtype
    if not opts.ortho:
        sign, log_abs_det = jnp.linalg.slogdet(w)
        logdet_term = jnp.where(
            sign == 0,
            jnp.asarray(_SINGULAR_LOSS, dtype),
            -log_abs_det.astype(dtype),
        )
    else:
        logdet_term = jnp.asarray(0.0, dtype)

    ll_means = _loglik_rowmeans(y, opts)
    loss = logdet_term + jnp.sum(signs * ll_means)

    if opts.extended and not opts.ortho:
        loss = loss + 0.5 * jnp.sum(jnp.mean(y * y, axis=1))
    return loss


def _push_memory(mem: LbfgsMemory, s, y, r, do_push) -> LbfgsMemory:
    """Append (s, y, r); evict the oldest when full (core.rs:296-312)."""
    m = mem.s_mem.shape[0]
    full = mem.count >= m
    s_mem = jnp.where(full, jnp.roll(mem.s_mem, -1, axis=0), mem.s_mem)
    y_mem = jnp.where(full, jnp.roll(mem.y_mem, -1, axis=0), mem.y_mem)
    r_mem = jnp.where(full, jnp.roll(mem.r_mem, -1, axis=0), mem.r_mem)
    idx = jnp.where(full, m - 1, mem.count)
    s_mem = s_mem.at[idx].set(s)
    y_mem = y_mem.at[idx].set(y)
    r_mem = r_mem.at[idx].set(r)
    count = jnp.minimum(mem.count + 1, m)
    return LbfgsMemory(
        jnp.where(do_push, s_mem, mem.s_mem),
        jnp.where(do_push, y_mem, mem.y_mem),
        jnp.where(do_push, r_mem, mem.r_mem),
        jnp.where(do_push, count, mem.count),
    )


def _clear_memory(mem: LbfgsMemory) -> LbfgsMemory:
    return LbfgsMemory(mem.s_mem, mem.y_mem, mem.r_mem, jnp.zeros_like(mem.count))


def solve_hessian_system(h, h_off, g):
    """Pairwise 2x2 Hessian solves, vectorized (lbfgs.rs:136-150).

    result[i,j] = (h[j,i]*g[i,j] - h_off[i]*g[j,i]) / det with
    det = h[i,j]*h[j,i] - h_off[i]*h_off[j]; entries with |det|<=1e-15
    are zero.
    """
    det = h * h.T - jnp.outer(h_off, h_off)
    numer = h.T * g - h_off[:, None] * g.T
    safe_det = jnp.where(jnp.abs(det) > 1e-15, det, 1.0)
    return jnp.where(jnp.abs(det) > 1e-15, numer / safe_det, 0.0)


def regularize_hessian(h, h_off, lambda_min):
    """Eigenvalue-floor the 2x2 Hessian blocks (lbfgs.rs:155-171).

    Off-diagonal entries only; the smaller eigenvalue of the (i,j)
    block is lifted to lambda_min.
    """
    n = h.shape[0]
    diff = h - h.T
    discr = jnp.sqrt(diff * diff + 4.0 * jnp.outer(h_off, h_off))
    eigenvalue = 0.5 * (h + h.T - discr)
    off_diag = ~jnp.eye(n, dtype=bool)
    bump = jnp.where(off_diag & (eigenvalue < lambda_min), lambda_min - eigenvalue, 0.0)
    return h + bump


def compute_direction(g, h, h_off, mem: LbfgsMemory, opts: CoreOptions):
    """L-BFGS two-loop recursion with the sparse-Hessian preconditioner
    as the initial inverse-Hessian guess (lbfgs.rs:84-133)."""
    m = mem.s_mem.shape[0]
    dtype = g.dtype

    # Backward pass: newest (count-1) -> oldest (0).
    def bwd(t, carry):
        q, alphas = carry
        i = mem.count - 1 - t
        valid = i >= 0
        i_c = jnp.maximum(i, 0)
        s_i = mem.s_mem[i_c]
        y_i = mem.y_mem[i_c]
        r_i = mem.r_mem[i_c]
        a = r_i * jnp.sum(s_i * q)
        q_new = q - a * y_i
        alphas = alphas.at[i_c].set(jnp.where(valid, a, alphas[i_c]))
        return jnp.where(valid, q_new, q), alphas

    q, alphas = lax.fori_loop(0, m, bwd, (g, jnp.zeros((m,), dtype)))

    if opts.ortho:
        z = q / h
        z = (z - z.T) / 2.0
    else:
        z = solve_hessian_system(h, h_off, q)

    # Forward pass: oldest (0) -> newest (count-1).
    def fwd(i, z):
        valid = i < mem.count
        s_i = mem.s_mem[i]
        y_i = mem.y_mem[i]
        r_i = mem.r_mem[i]
        beta = r_i * jnp.sum(y_i * z)
        z_new = z + (alphas[i] - beta) * s_i
        return jnp.where(valid, z_new, z)

    z = lax.fori_loop(0, m, fwd, z)
    return -z


def line_search(y, w, direction, signs, current_loss, ls_tries, opts: CoreOptions):
    """Backtracking line search (core.rs:99-150).

    Tries alpha = 1, 1/2, 1/4, ... accepting the first loss decrease.
    On failure the returned (y, w, loss) are from the *last tried*
    alpha while the returned step uses the once-more-halved alpha —
    matching the reference exactly (core.rs:117-149).
    """
    n = w.shape[0]
    dtype = y.dtype
    eye = jnp.eye(n, dtype=dtype)

    def try_alpha(alpha):
        if opts.ortho:
            tm = matrix_exp(direction * alpha)
        else:
            tm = eye + alpha * direction
        y_new = _constrain(tm @ y, opts)
        w_new = tm @ w
        loss = compute_loss(y_new, w_new, signs, opts)
        return y_new, w_new, loss

    def cond(carry):
        alpha, tries, success, _, _, _ = carry
        return (~success) & (tries < ls_tries)

    def body(carry):
        alpha, tries, _, _, _, _ = carry
        y_new, w_new, loss = try_alpha(alpha)
        success = loss < current_loss
        next_alpha = jnp.where(success, alpha, alpha / 2.0)
        return (next_alpha, tries + 1, success, y_new, w_new, loss)

    init = (
        jnp.asarray(1.0, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        y,
        w,
        jnp.asarray(current_loss, dtype),
    )
    alpha, _, success, y_new, w_new, loss = lax.while_loop(cond, body, init)
    step = direction * alpha
    return success, y_new, w_new, loss, step


def _iteration_update(st: CoreState, g, h, h_off, signs, old_signs, sign_change,
                      gradient_norm, covariance, lambda_min, opts: CoreOptions) -> CoreState:
    """Post-convergence-check part of one iteration (core.rs:296-390)."""
    # L-BFGS memory push with the previous step (core.rs:296-313).
    y_diff = g - st.g_old
    denom = jnp.sum(st.prev_step * y_diff)
    r = 1.0 / denom
    do_push = (st.it > 0) & jnp.isfinite(r)
    memory = _push_memory(st.memory, st.prev_step, y_diff, r, do_push)

    # Extended sign change: re-baseline the loss, flush memory
    # (core.rs:317-331). Singular here is a 1e15 penalty, not an error.
    if opts.extended:
        def flush(mem):
            new_loss = compute_loss(st.y, st.w, signs, opts)
            new_loss = jnp.where(jnp.isfinite(new_loss), new_loss, st.loss.dtype.type(_SINGULAR_LOSS))
            return new_loss, _clear_memory(mem)

        flushed_loss, flushed_mem = flush(memory)
        current_loss = jnp.where(sign_change, flushed_loss, st.loss)
        memory = LbfgsMemory(
            memory.s_mem, memory.y_mem, memory.r_mem,
            jnp.where(sign_change, flushed_mem.count, memory.count),
        )
    else:
        current_loss = st.loss

    direction = compute_direction(g, h, h_off, memory, opts)

    success, ls_y, ls_w, ls_loss, ls_step = line_search(
        st.y, st.w, direction, signs, current_loss, st_ls_tries(opts), opts
    )

    # Gradient-descent fallback on line-search failure (core.rs:349-364):
    # clear memory and retry with -G for 10 tries; take its result even
    # if it also fails.
    def with_fallback(_):
        fb_success, fb_y, fb_w, fb_loss, fb_step = line_search(
            st.y, st.w, -g, signs, current_loss,
            jnp.asarray(_FALLBACK_LS_TRIES, jnp.int32), opts,
        )
        return fb_y, fb_w, fb_loss, fb_step, jnp.zeros_like(memory.count)

    def without_fallback(_):
        return ls_y, ls_w, ls_loss, ls_step, memory.count

    new_y, new_w, new_loss, step, mem_count = lax.cond(
        ~success, with_fallback, without_fallback, operand=None
    )
    memory = LbfgsMemory(memory.s_mem, memory.y_mem, memory.r_mem, mem_count)

    # Extended covariance proxy update C = W cov W^T (core.rs:375-379);
    # only when an explicit covariance was supplied.
    if opts.extended and opts.has_cov:
        c = new_w @ covariance @ new_w.T
    else:
        c = st.c

    if opts.verbose:
        jax.debug.print(
            "iteration {it}, gradient norm = {gn:.4e}, loss = {l:.4e}",
            it=st.it + 1, gn=gradient_norm, l=new_loss,
        )

    return CoreState(
        w=new_w,
        y=_constrain(new_y, opts),
        loss=new_loss,
        signs=signs,
        old_signs=old_signs,
        c=c,
        g_old=g,
        prev_step=step,
        memory=memory,
        it=st.it + 1,
        n_iter_done=st.it + 1,
        gradient_norm=gradient_norm,
        converged=jnp.asarray(False),
    )


def st_ls_tries(opts: CoreOptions):
    return jnp.asarray(opts.ls_tries, jnp.int32)


def _iteration_body(st: CoreState, covariance, tol, lambda_min, opts: CoreOptions) -> CoreState:
    """One full optimizer iteration (core.rs:211-391)."""
    n = st.w.shape[0]
    dtype = st.y.dtype

    need_h = not opts.ortho
    need_ysq = opts.extended and not opts.ortho
    moments = _compute_raw_moments(st.y, opts, need_h, need_ysq)
    g = moments.g_raw
    pm0 = moments.pm_raw

    if opts.extended:
        # Kurtosis-based sub/super-Gaussian sign detection (core.rs:225-237).
        k = pm0 * jnp.diagonal(st.c) - jnp.diagonal(g)
        # f64::signum maps +0.0 -> 1.0; match that, not jnp.sign's 0.
        signs = jnp.where(k >= 0, 1.0, -1.0).astype(dtype)
        sign_change = (st.it > 0) & jnp.any(signs != st.old_signs)
        old_signs = signs
        g = signs[:, None] * g
        pm = pm0 * signs  # row-sign-flipped E[psi']
    else:
        signs = st.signs
        old_signs = st.old_signs
        sign_change = jnp.asarray(False)
        pm = pm0

    if opts.extended and not opts.ortho:
        g = g + st.c
        # psi' += 1 folds into the Hessian moment below.

    # Hessian pieces (core.rs:256-276).
    if opts.ortho:
        h_off = jnp.diagonal(g)
        h = 0.5 * (pm[:, None] + pm[None, :] - h_off[:, None] - h_off[None, :])
        h = jnp.maximum(h, lambda_min)
    else:
        h_off = jnp.ones((n,), dtype)
        h = moments.h_raw
        if opts.extended:
            # (signs*psi' + 1) (Y^2)^T / T  ==  signs*H_raw + row-broadcast E[Y^2].
            h = signs[:, None] * h + moments.ysq_rowmean[None, :]
        h = regularize_hessian(h, h_off, lambda_min)

    # Project the gradient (core.rs:280-286).
    if opts.ortho:
        g = skew_symmetric(g)
    else:
        g = g - jnp.eye(n, dtype=dtype)

    gradient_norm = jnp.max(jnp.abs(g))
    converged = gradient_norm < tol

    def finish(_):
        return st._replace(
            signs=signs,
            old_signs=old_signs,
            n_iter_done=st.it + 1,
            gradient_norm=gradient_norm,
            converged=jnp.asarray(True),
        )

    def proceed(_):
        return _iteration_update(
            st, g, h, h_off, signs, old_signs, sign_change,
            gradient_norm, covariance, lambda_min, opts,
        )

    return lax.cond(converged, finish, proceed, operand=None)


def init_state(x, covariance, opts: CoreOptions) -> Tuple[CoreState, jnp.ndarray]:
    """Build the initial carry (core.rs:176-209).

    Returns (state, initial_singular) — the reference errors out if the
    very first loss evaluation hits a singular W (core.rs:188-193);
    with W = I that is unreachable, but the flag is surfaced anyway.
    """
    n, t = x.shape
    dtype = x.dtype
    w = jnp.eye(n, dtype=dtype)
    y = _constrain(x, opts)
    signs = jnp.ones((n,), dtype)

    loss = compute_loss(y, w, signs, opts)
    initial_singular = loss >= _SINGULAR_LOSS

    if opts.extended:
        if opts.has_cov:
            c = covariance
        else:
            c = (y @ y.T) / jnp.asarray(t, dtype)
    else:
        c = jnp.eye(n, dtype=dtype)

    mem = LbfgsMemory(
        s_mem=jnp.zeros((opts.m, n, n), dtype),
        y_mem=jnp.zeros((opts.m, n, n), dtype),
        r_mem=jnp.zeros((opts.m,), dtype),
        count=jnp.asarray(0, jnp.int32),
    )

    state = CoreState(
        w=w,
        y=y,
        loss=loss,
        signs=signs,
        old_signs=jnp.ones((n,), dtype),
        c=c,
        g_old=jnp.zeros((n, n), dtype),
        prev_step=jnp.zeros((n, n), dtype),
        memory=mem,
        it=jnp.asarray(0, jnp.int32),
        n_iter_done=jnp.asarray(0, jnp.int32),
        gradient_norm=jnp.asarray(1.0, dtype),
        converged=jnp.asarray(False),
    )
    return state, initial_singular


def run_core(x, covariance, tol, lambda_min, max_iter, opts: CoreOptions) -> CoreResult:
    """Run the full optimizer loop (core.rs:162-401). Jit-friendly."""
    state, _ = init_state(x, covariance, opts)
    tol = jnp.asarray(tol, x.dtype)
    lambda_min = jnp.asarray(lambda_min, x.dtype)
    max_iter = jnp.asarray(max_iter, jnp.int32)

    def cond(st: CoreState):
        return (st.it < max_iter) & (~st.converged)

    def body(st: CoreState):
        return _iteration_body(st, covariance, tol, lambda_min, opts)

    final = lax.while_loop(cond, body, state)

    return CoreResult(
        y=final.y,
        w=final.w,
        converged=final.converged,
        gradient_norm=final.gradient_norm,
        n_iterations=final.n_iter_done,
        signs=final.signs,
    )


run_core_jit = jax.jit(run_core, static_argnames=("opts",))
