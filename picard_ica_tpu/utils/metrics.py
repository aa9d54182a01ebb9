"""Evaluation utilities: Amari distance and permutation alignment.

Mirrors the reference's eval helpers (src/utils.rs). These are
host-side, eval-time tools (tiny N x N work), so the data-dependent
swap loop in ``permute`` runs in NumPy rather than being forced into
compiler-friendly form.
"""

from __future__ import annotations

import numpy as np


def amari_distance(w, a) -> float:
    """Amari distance between unmixing W and mixing A (utils.rs:82-103).

    Zero iff ``W @ A`` is a scaled permutation, i.e. perfect separation.
    """
    p = np.abs(np.asarray(w) @ np.asarray(a))
    n = p.shape[0]

    def s(r):
        r_sq = r * r
        row_sum = r_sq.sum(axis=1)
        row_max = r_sq.max(axis=1)
        valid = row_max > 1e-15
        return float(np.sum(np.where(valid, row_sum / np.maximum(row_max, 1e-300) - 1.0, 0.0)))

    return (s(p) + s(p.T)) / (2.0 * n)


def permute(a, scale: bool = True):
    """Permute/scale a matrix toward identity (utils.rs:16-69).

    Greedy row swaps maximizing the diagonal, optional unit-diagonal
    scaling, then a column-sum reorder for deterministic output.
    """
    a = np.array(a, dtype=np.float64, copy=True)
    n = a.shape[0]

    done = False
    while not done:
        done = True
        for i in range(n):
            for j in range(i):
                diag_sq = a[i, i] ** 2 + a[j, j] ** 2
                off_sq = a[i, j] ** 2 + a[j, i] ** 2
                if diag_sq < off_sq:
                    a[[i, j], :] = a[[j, i], :]
                    done = False

    if scale:
        for i in range(n):
            d = a[i, i]
            if abs(d) > 1e-10:
                a[i, :] /= d

    col_sums = np.abs(a).sum(axis=0)
    order = np.argsort(col_sums, kind="stable")
    return a[np.ix_(order, order)]


def check_density(density, tol: float = 1e-5) -> bool:
    """Finite-difference check: score == d/dy log_lik (utils.rs:110-137)."""
    import jax.numpy as jnp

    test_points = np.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
    eps = 1e-7

    for y in test_points:
        ll_plus = float(density.log_lik(jnp.asarray(y + eps, jnp.float64 if _x64() else jnp.float32)))
        ll_minus = float(density.log_lik(jnp.asarray(y - eps, jnp.float64 if _x64() else jnp.float32)))
        numerical = (ll_plus - ll_minus) / (2.0 * eps)
        score, _ = density.score_and_der(jnp.asarray([[y]]))
        if abs(numerical - float(score[0, 0])) > tol:
            return False
    return True


def _x64() -> bool:
    import jax

    return bool(jax.config.jax_enable_x64)
