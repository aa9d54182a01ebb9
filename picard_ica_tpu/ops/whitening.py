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

import jax
import jax.numpy as jnp
import numpy as np

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


# Exactly-rank-deficient data leaves the f64 eigh's smallest
# eigenvalue at ~machine-eps * lambda_max; anything below this RELATIVE
# floor is numerically zero. Needed because forming X X^T squares the
# condition number: the reference's absolute 1e-10 test on the SVD's
# sigma_min (whitening.rs:77) cannot be reproduced through the
# covariance (sigma = sqrt(lambda) bottoms out at sqrt(eps)*sigma_max),
# so rank deficiency is detected relatively instead.
_RELATIVE_EIG_FLOOR = 1e-14


def whitening_matrix_from_covariance(cov, n_samples: int, n_components: int):
    """Build K from the N x N covariance ``X X^T`` (unnormalized).

    Returns ``(k_matrix, min_singular_value)`` with ``min_singular_value``
    forced to 0.0 when the covariance is numerically rank-deficient.
    Eager (host-side): the covariance is a tiny replicated N x N
    matrix, and decomposing it in NumPy f64 keeps the whitening basis
    and the rank test at full precision even when the device computes
    in f32 (TPU). The singularity *raise* is the caller's job.
    """
    dtype = cov.dtype
    cov64 = np.asarray(cov, np.float64)
    eigenvalues, eigenvectors = np.linalg.eigh(cov64)
    # eigh returns ascending order; the SVD convention is descending.
    order = np.argsort(eigenvalues)[::-1][:n_components]
    top_eigs = eigenvalues[order]
    u = eigenvectors[:, order]  # (n_features, k), columns = left sing. vectors
    # Singular values of X are sqrt of eigenvalues of X X^T.
    s = np.sqrt(np.maximum(top_eigs, 0.0))
    min_sv = float(s[-1]) if s.size else 0.0
    if eigenvalues[-1] > 0 and top_eigs[-1] < eigenvalues[-1] * _RELATIVE_EIG_FLOOR:
        min_sv = 0.0

    scale = np.sqrt(np.float64(n_samples))
    safe_s = np.maximum(s, np.finfo(np.float64).tiny)
    k = (u / safe_s[None, :]).T * scale  # (k, n_features)

    # Deterministic sign: flip rows whose largest-|entry| is negative
    # (whitening.rs:92-107, "MATLAB convention").
    max_idx = np.argmax(np.abs(k), axis=1)
    row_sign = np.sign(np.take_along_axis(k, max_idx[:, None], axis=1))
    row_sign = np.where(row_sign == 0, 1.0, row_sign)
    return jnp.asarray(k * row_sign, dtype), min_sv


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
    cov = jnp.dot(x, x.T, precision=jax.lax.Precision.HIGHEST)
    k, min_sv = whitening_matrix_from_covariance(cov, n_samples, n_components)
    if min_sv < _MIN_SINGULAR_VALUE:
        raise SingularMatrixError()

    return WhiteningResult(
        data=jnp.dot(k, x, precision=jax.lax.Precision.HIGHEST),
        whitening_matrix=k,
    )
