"""Centering and PCA whitening.

The reference whitens with a thin SVD of the N x T data matrix
(whitening.rs:61-65). On TPU the SVD of a long matrix is the wrong
formulation: the sample axis is sharded, so we compute the tiny N x N
covariance ``C = X X^T`` with one (sharded, psum-reduced) matmul and
eigendecompose it replicated. The two are mathematically identical:
if X = U S V^T then C = U S^2 U^T, so the whitening matrix
``K = (U / s)^T[:k] * sqrt(T)`` (whitening.rs:81-90) is recovered from
the top-k eigenpairs of C. The deterministic sign convention
(largest-|entry| of each row of K made positive, whitening.rs:92-107)
is reproduced exactly so results are comparable across implementations.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..errors import InvalidDimensionsError, SingularMatrixError

# Reject singular values below this (whitening.rs:77).
_MIN_SINGULAR_VALUE = 1e-10


class WhiteningResult(NamedTuple):
    """Whitened data + whitening matrix (whitening.rs:10-15)."""

    data: jnp.ndarray  # (n_components, n_samples)
    whitening_matrix: jnp.ndarray  # (n_components, n_features)


def center(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Subtract the per-row (per-feature) mean (whitening.rs:24-35)."""
    mean = jnp.mean(x, axis=1)
    return x - mean[:, None], mean


def whitening_matrix_from_covariance(cov, n_samples: int, n_components: int):
    """Build K from the N x N covariance ``X X^T`` (unnormalized).

    Returns ``(k_matrix, min_singular_value)``. Jit-safe; the
    singularity check is the caller's job (eager path raises).
    """
    eigenvalues, eigenvectors = jnp.linalg.eigh(cov)
    # eigh returns ascending order; the SVD convention is descending.
    order = jnp.argsort(eigenvalues)[::-1][:n_components]
    top_eigs = eigenvalues[order]
    u = eigenvectors[:, order]  # (n_features, k), columns = left sing. vectors
    # Singular values of X are sqrt of eigenvalues of X X^T.
    s = jnp.sqrt(jnp.maximum(top_eigs, 0.0))
    min_sv = jnp.min(s)

    scale = jnp.sqrt(jnp.asarray(n_samples, cov.dtype))
    safe_s = jnp.maximum(s, jnp.finfo(cov.dtype).tiny)
    k = (u / safe_s[None, :]).T * scale  # (k, n_features)

    # Deterministic sign: flip rows whose largest-|entry| is negative
    # (whitening.rs:92-107, "MATLAB convention").
    max_idx = jnp.argmax(jnp.abs(k), axis=1)
    row_sign = jnp.sign(jnp.take_along_axis(k, max_idx[:, None], axis=1))
    row_sign = jnp.where(row_sign == 0, 1.0, row_sign)
    return k * row_sign, min_sv


def whiten(x, n_components: int) -> WhiteningResult:
    """PCA-whiten centered data (eager; raises on singular data).

    ``x`` is (n_features, n_samples); output data has unit variance per
    component (scaled by sqrt(T) as in whitening.rs:83).
    """
    n_features, n_samples = x.shape
    if n_components > n_features:
        raise InvalidDimensionsError(
            f"n_components ({n_components}) cannot exceed n_features ({n_features})"
        )

    # Sharded-friendly: one N x T @ T x N contraction (psum under SPMD),
    # then a replicated N x N eigh.
    cov = x @ x.T
    k, min_sv = whitening_matrix_from_covariance(cov, n_samples, n_components)
    if float(min_sv) < _MIN_SINGULAR_VALUE:
        raise SingularMatrixError()

    return WhiteningResult(data=k @ x, whitening_matrix=k)
