"""Symmetric ("parallel") FastICA warm start.

Mirrors ``ica_par`` (reference: src/solver.rs:218-249): a fixed number
of fixed-point iterations
``C = E[g(WX) X^T] - diag(E[g'(WX)]) W`` followed by symmetric
decorrelation — no convergence test. The E[.] moments are T-axis
contractions, so under SPMD they are local partials + psum; the
decorrelation is a replicated N x N eigh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.densities import Density
from ..ops.linalg import sym_decorrelation_with_mineig


def ica_par(x, density: Density, max_iter: int, w_init):
    """Run FastICA pre-iterations; returns (W, min_eig_seen).

    ``min_eig_seen`` is the smallest eigenvalue encountered across all
    symmetric decorrelations, so the eager caller can reproduce the
    reference's singularity error (math.rs:21-24) without host syncs
    inside the loop.
    """
    t = x.shape[1]
    inv_t = jnp.asarray(1.0 / t, x.dtype)

    w, min_eig = sym_decorrelation_with_mineig(w_init)

    def body(_, carry):
        w, min_eig = carry
        wx = jnp.dot(w, x, precision=jax.lax.Precision.HIGHEST)
        gwtx, g_wtx = density.score_and_der(wx)
        g_wtx_mean = jnp.mean(g_wtx, axis=1)
        c = jnp.dot(gwtx, x.T, precision=jax.lax.Precision.HIGHEST) * inv_t - g_wtx_mean[:, None] * w
        w_new, me = sym_decorrelation_with_mineig(c)
        return w_new, jnp.minimum(min_eig, me)

    return lax.fori_loop(0, max_iter, body, (w, min_eig))


ica_par_jit = jax.jit(ica_par, static_argnames=("density", "max_iter"))
