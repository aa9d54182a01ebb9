"""JADE (Joint Approximate Diagonalization of Eigenmatrices) warm start.

Same math as the reference (src/jade.rs) re-architected for TPU:

  * The reference builds the 4th-order cumulant matrices with an
    O(N^4 T) scalar loop nest over an N^2 x T intermediate
    (jade.rs:91-120). Here the whole Gram of pair products
    ``Q[(i,j),(k,l)] = E[x_i x_j x_k x_l]`` is ONE (N^2, chunk) x
    (chunk, N^2) matmul accumulated over T chunks on the MXU; the
    delta corrections for whitened data (jade.rs:114-120) are sparse
    scatter updates rather than materialized N^4 delta tensors.
  * The reference recomputes each Givens angle from the *original*
    cumulants through the current V, an O(P N^2) block build per pair
    (jade.rs:148-159). We maintain the rotated tensor R_m = V^T Q_m V
    in the carry and conjugate it by each Givens rotation in O(P N)
    — algebraically identical, verified in tests against a direct
    recompute.

Sweep order over pairs (p < q, lexicographic) matches jade.rs:44-52.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.linalg import sym_decorrelation_with_mineig

_ANGLE_EPS = 1e-15  # jade.rs:175


def _pair_indices(n: int):
    """All (i, j) with i <= j in the reference's order (jade.rs:101-102)."""
    ps, qs = [], []
    for i in range(n):
        for j in range(i, n):
            ps.append(i)
            qs.append(j)
    return np.asarray(ps, np.int32), np.asarray(qs, np.int32)


def _sweep_pairs(n: int):
    """All (p, q) with p < q in the reference's sweep order (jade.rs:44-45)."""
    ps, qs = [], []
    for p in range(n):
        for q in range(p + 1, n):
            ps.append(p)
            qs.append(q)
    return np.asarray(ps, np.int32), np.asarray(qs, np.int32)


def compute_cumulant_matrices(x, chunk_size: int = 4096):
    """Symmetrized cumulant matrices for all pairs i <= j, shape (P, N, N).

    Assumes whitened input, i.e. E[x_a x_b] = delta_ab, exactly like the
    reference (jade.rs:83-86).
    """
    n, t = x.shape
    dtype = x.dtype

    chunk = min(chunk_size, t)
    n_chunks = -(-t // chunk)
    pad = n_chunks * chunk - t
    xp = jnp.pad(x, ((0, 0), (0, pad)))  # zero samples contribute 0 to sums
    xc = jnp.moveaxis(xp.reshape(n, n_chunks, chunk), 1, 0)  # (n_chunks, n, chunk)

    def accumulate(acc, x_chunk):
        z = (x_chunk[:, None, :] * x_chunk[None, :, :]).reshape(n * n, -1)
        return acc + jnp.dot(z, z.T, preferred_element_type=dtype), None

    gram, _ = lax.scan(accumulate, jnp.zeros((n * n, n * n), dtype), xc)

    pair_i, pair_j = _pair_indices(n)
    p_count = pair_i.shape[0]
    # Row (i, j) of the Gram is E[x_i x_j x_k x_l] * T over all (k, l).
    q = gram[pair_i * n + pair_j].reshape(p_count, n, n) / t

    # Whitened-data delta corrections (jade.rs:114-120), applied sparsely:
    #   - delta_ij delta_kl: subtract I for diagonal pairs (i == j)
    #   - delta_ik delta_jl: subtract 1 at [i, j]
    #   - delta_il delta_jk: subtract 1 at [j, i]
    eye = jnp.eye(n, dtype=dtype)
    q = q - (pair_i == pair_j)[:, None, None] * eye[None]
    rows = jnp.arange(p_count)
    q = q.at[rows, pair_i, pair_j].add(-1.0)
    q = q.at[rows, pair_j, pair_i].add(-1.0)

    # Symmetrize (jade.rs:124-125).
    return (q + jnp.swapaxes(q, 1, 2)) / 2.0


def _jacobi_sweeps(cumulants, n: int, max_iter: int, tol, verbose: bool):
    """Joint diagonalization by Jacobi/Givens sweeps (jade.rs:40-66)."""
    dtype = cumulants.dtype
    sweep_p, sweep_q = _sweep_pairs(n)
    sweep_p = jnp.asarray(sweep_p)
    sweep_q = jnp.asarray(sweep_q)
    n_pairs = sweep_p.shape[0]

    def pair_body(t_idx, carry):
        v, r, max_theta = carry
        p = sweep_p[t_idx]
        q = sweep_q[t_idx]

        # 2x2 objective accumulated over all rotated cumulants
        # (jade.rs:144-167); R already holds V^T Q V.
        h_pq = r[:, p, q] + r[:, q, p]
        h_ppqq = r[:, p, p] - r[:, q, q]
        g00 = jnp.sum(h_pq * h_pq)
        g01 = jnp.sum(h_pq * h_ppqq)
        g11 = jnp.sum(h_ppqq * h_ppqq)

        diff = g11 - g00
        near_zero = (jnp.abs(g01) < _ANGLE_EPS) & (jnp.abs(diff) < _ANGLE_EPS)
        angle = jnp.where(
            near_zero, jnp.asarray(0.0, dtype), 0.25 * jnp.arctan2(2.0 * g01, diff)
        )
        c = jnp.cos(angle)
        s = jnp.sin(angle)

        # V <- V G(p, q) with G = [[c, -s], [s, c]] on the (p, q) plane.
        #
        # NOTE — deliberate fix vs the reference: jade.rs:188-196 applies
        # the rotation [[c, s], [-s, c]], which is the *descent* direction
        # for the angle formula at jade.rs:174-179; the mismatch makes the
        # reference's sweeps oscillate instead of diagonalizing (its test
        # suite only checks orthogonality of the output, jade.rs:246-255,
        # so the defect is invisible there). With this orientation the
        # sweeps maximize the joint-diagonality objective and converge in
        # a handful of sweeps; tests/test_jade.py verifies both the
        # off-diagonal decay and actual source separation.
        vp = v[:, p]
        vq = v[:, q]
        v = v.at[:, p].set(c * vp + s * vq)
        v = v.at[:, q].set(-s * vp + c * vq)

        # R <- G^T R G, rows then columns, for every cumulant matrix.
        rp = r[:, p, :]
        rq = r[:, q, :]
        r = r.at[:, p, :].set(c * rp + s * rq)
        r = r.at[:, q, :].set(-s * rp + c * rq)
        cp = r[:, :, p]
        cq = r[:, :, q]
        r = r.at[:, :, p].set(c * cp + s * cq)
        r = r.at[:, :, q].set(-s * cp + c * cq)

        return v, r, jnp.maximum(max_theta, jnp.abs(angle))

    def sweep_cond(carry):
        _, _, sweep, last_max = carry
        return (sweep < max_iter) & (last_max >= tol)

    def sweep_body(carry):
        v, r, sweep, _ = carry
        v, r, max_theta = lax.fori_loop(
            0, n_pairs, pair_body, (v, r, jnp.asarray(0.0, dtype))
        )
        if verbose:
            jax.debug.print(
                "JADE iteration {it}: max angle = {mt:.4e}", it=sweep + 1, mt=max_theta
            )
        return v, r, sweep + 1, max_theta

    v0 = jnp.eye(n, dtype=dtype)
    init = (v0, cumulants, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, dtype))
    v, _, n_sweeps, _ = lax.while_loop(sweep_cond, sweep_body, init)
    return v, n_sweeps


def jade(x, max_iter: int, tol: float = 1e-6, verbose: bool = False):
    """Run JADE on whitened data; returns (W, min_eig) (jade.rs:22-72).

    ``min_eig`` is the minimum eigenvalue from the final symmetric
    decorrelation, for the eager caller's singularity check.
    """
    n = x.shape[0]
    if n < 2:
        return jnp.eye(n, dtype=x.dtype), jnp.asarray(1.0, x.dtype)

    cumulants = compute_cumulant_matrices(x)
    if verbose:
        jax.debug.print(
            "JADE: {k} cumulant matrices computed", k=cumulants.shape[0]
        )

    v, _ = _jacobi_sweeps(cumulants, n, max_iter, jnp.asarray(tol, x.dtype), verbose)

    # V's columns span the (whitened) mixing basis; the unmixing that
    # recovers sources from whitened data is V^T. The reference returns
    # V itself (jade.rs:69-71) — combined with its non-convergent sweeps
    # (see _jacobi_sweeps) its warm start is an arbitrary orthogonal
    # matrix; returning the transpose makes the warm start actually land
    # near the solution (verified by separation tests).
    return sym_decorrelation_with_mineig(v.T)


jade_jit = jax.jit(jade, static_argnames=("max_iter", "verbose"))
