"""Explicit SPMD moment kernels via shard_map + psum.

The jitted core loop normally relies on GSPMD propagation: Y carries a
(None, "samples") sharding and XLA inserts the all-reduces for every
T-axis contraction. This module provides the *explicit* formulation —
per-shard partial moments reduced with ``lax.psum`` — used to (a) pin
collective placement when hand-tuning, and (b) test that the implicit
and explicit paths agree bit-for-bit on a CPU mesh (the reference has
no distributed tests at all; SURVEY.md §4 calls for exactly this).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map_mod  # jax >= 0.6 name

    shard_map = jax.shard_map
except (ImportError, AttributeError):  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def shard_map_replicated(fn, **kwargs):
    """``shard_map`` with the varying-manual-axes check disabled,
    across jax spellings (``check_vma`` on >= 0.6, ``check_rep``
    older). For local functions whose outputs are made replicated by
    EXPLICIT psums: pallas_call outputs carry no varying-mesh-axes
    metadata, so the automatic check cannot see the replication.
    The single shared version-compat shim (previously copied in
    models/core.py and models/jade.py)."""
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        return shard_map(fn, check_rep=False, **kwargs)

from ..ops.densities import Density
from ..ops.moments import RawMoments
from .mesh import SAMPLE_AXIS


def compute_raw_moments_psum(y, density: Density, mesh, need_h: bool, need_ysq: bool) -> RawMoments:
    """Raw moments with explicit per-shard partials + psum.

    Semantically identical to ops.moments.compute_raw_moments_xla run
    on the full array; every per-sample quantity is a local partial sum
    reduced over the "samples" mesh axis (SURVEY.md §2.3's enumeration).
    """
    n, t = y.shape
    dtype = y.dtype
    inv_t = jnp.asarray(1.0 / t, dtype)

    def local_kernel(y_local):
        psi, psi_d = density.score_and_der(y_local)
        g_part = jnp.dot(psi, y_local.T, precision=jax.lax.Precision.HIGHEST)
        pm_part = jnp.sum(psi_d, axis=1)
        if need_h:
            ysq = y_local * y_local
            h_part = jnp.dot(psi_d, ysq.T, precision=jax.lax.Precision.HIGHEST)
        else:
            h_part = jnp.zeros((n, n), dtype)
        if need_ysq:
            ysq_part = jnp.sum(y_local * y_local, axis=1)
        else:
            ysq_part = jnp.zeros((n,), dtype)

        g = lax.psum(g_part, SAMPLE_AXIS) * inv_t
        pm = lax.psum(pm_part, SAMPLE_AXIS) * inv_t
        h = lax.psum(h_part, SAMPLE_AXIS) * inv_t
        ysq_mean = lax.psum(ysq_part, SAMPLE_AXIS) * inv_t
        return g, pm, h, ysq_mean

    g, pm, h, ysq_mean = shard_map(
        local_kernel,
        mesh=mesh,
        in_specs=P(None, SAMPLE_AXIS),
        out_specs=P(),
    )(y)
    return RawMoments(g, pm, h, ysq_mean)


def loglik_rowmeans_psum(y, density: Density, mesh):
    """Explicit-psum version of the loss's density term row means."""
    t = y.shape[1]
    inv_t = jnp.asarray(1.0 / t, y.dtype)

    def local_kernel(y_local):
        ll_part = jnp.sum(density.log_lik(y_local), axis=1)
        return lax.psum(ll_part, SAMPLE_AXIS) * inv_t

    return shard_map(
        local_kernel, mesh=mesh, in_specs=P(None, SAMPLE_AXIS), out_specs=P()
    )(y)
