"""N x N linalg kernels (reference: math.rs tests + L-BFGS helpers)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from picard_ica_tpu.errors import SingularMatrixError
from picard_ica_tpu.ops.linalg import (
    matrix_exp,
    skew_symmetric,
    slogdet,
    sym_decorrelation,
)


def test_sym_decorrelation_orthonormal():
    """(math.rs:101-111) rows of the result are orthonormal."""
    w = jnp.asarray([[1.0, 0.5], [0.5, 1.0]])
    w_dec = sym_decorrelation(w)
    np.testing.assert_allclose(np.asarray(w_dec @ w_dec.T), np.eye(2), atol=1e-10)


def test_sym_decorrelation_random():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((6, 6)))
    w_dec = sym_decorrelation(w)
    np.testing.assert_allclose(np.asarray(w_dec @ w_dec.T), np.eye(6), atol=1e-10)


def test_sym_decorrelation_singular_raises():
    """(math.rs:21-24) min eigenvalue < 1e-10 is an error."""
    w = jnp.zeros((3, 3))
    with pytest.raises(SingularMatrixError):
        sym_decorrelation(w)


def test_matrix_exp_zero_is_identity():
    """(math.rs:114-124)."""
    np.testing.assert_allclose(
        np.asarray(matrix_exp(jnp.zeros((3, 3)))), np.eye(3), atol=1e-10
    )


@pytest.mark.parametrize("scale", [0.01, 0.5, 3.0, 20.0])
def test_matrix_exp_matches_scipy(scale):
    rng = np.random.default_rng(1)
    a = rng.standard_normal((5, 5))
    a = (a - a.T) / 2 * scale  # skew, like the Picard-O usage
    ours = np.asarray(matrix_exp(jnp.asarray(a)))
    ref = scipy.linalg.expm(a)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_matrix_exp_orthogonal_for_skew():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4, 4))
    a = (a - a.T) / 2
    e = np.asarray(matrix_exp(jnp.asarray(a)))
    np.testing.assert_allclose(e @ e.T, np.eye(4), atol=1e-10)


def test_slogdet_sign_and_value():
    """(math.rs:127-132) det([[1,2],[3,4]]) = -2."""
    sign, logabs = slogdet(jnp.asarray([[1.0, 2.0], [3.0, 4.0]]))
    assert float(sign) == pytest.approx(-1.0)
    assert float(logabs) == pytest.approx(np.log(2.0), rel=1e-10)


def test_slogdet_large_values_no_overflow():
    """(math.rs:135-141) 1e150-scale determinant stays finite."""
    sign, logabs = slogdet(jnp.asarray([[1e150, 0.0], [0.0, 1e150]]))
    assert float(sign) == pytest.approx(1.0)
    assert float(logabs) == pytest.approx(2 * 150 * np.log(10.0), rel=1e-6)


def test_skew_symmetric():
    """(math.rs:144-152)."""
    s = np.asarray(skew_symmetric(jnp.asarray([[1.0, 2.0], [3.0, 4.0]])))
    np.testing.assert_allclose(s, -s.T, atol=1e-15)
    assert s[0, 1] == pytest.approx(-0.5)


@pytest.mark.parametrize("scale", [1e-3, 1.0, 100.0])
def test_expm_chain_matches_per_alpha_expm(scale):
    """chain[j-k] == expm(2^-k d) for every line-search alpha."""
    from picard_ica_tpu.ops.linalg import expm_pow2_chain

    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.standard_normal((5, 5)) * scale)
    n_alphas = 10
    chain, j = expm_pow2_chain(d, n_alphas)
    # Larger ||d|| means more squarings, each of which roughly doubles
    # accumulated rounding — at scale=100 (||d|| ~ 200, expm ~ 1e85)
    # chain and scipy legitimately differ at ~1e-9 relative.
    rtol = 1e-10 if scale <= 1.0 else 1e-7
    for k in range(n_alphas):
        ref = scipy.linalg.expm(np.asarray(d) / 2.0**k)
        np.testing.assert_allclose(
            np.asarray(chain[int(j) - k]), ref, rtol=rtol, atol=1e-10
        )


def test_expm_chain_huge_norm_stays_accurate():
    """Directions with max|d| > 2^16 take the dynamic pre-squaring
    tail instead of silently truncating the scaling exponent (the
    reference's per-try expm has no cap, math.rs:48)."""
    from picard_ica_tpu.ops.linalg import expm_pow2_chain

    # Diagonal keeps expm exactly computable: expm(diag(v)) = diag(e^v)
    # ... but e^(2^17) overflows, so use a NILPOTENT-plus-diagonal-free
    # huge skew matrix whose exact expm is a rotation: d = theta * J
    # with J = [[0, -1], [1, 0]], expm(2^-k d) = rotation by 2^-k theta.
    theta = 3.0 * 2.0**18  # norm ~7.9e5 >> 2^16
    d = jnp.asarray([[0.0, -theta], [theta, 0.0]])
    n_alphas = 10
    chain, j = expm_pow2_chain(d, n_alphas)
    for k in (0, 5, 9):
        ang = theta / 2.0**k
        ref = np.array(
            [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        )
        got = np.asarray(chain[int(j) - k])
        # Scaling-and-squaring at angle ~2^19 rad intrinsically
        # amplifies rounding by ~2^s (true of the reference's per-try
        # expm as well); the uncapped per-try matrix_exp is the
        # behavioral target and a truncated-scaling chain would be off
        # by O(1), not O(1e-6).
        per_try = np.asarray(matrix_exp(jnp.asarray(d / 2.0**k)))
        np.testing.assert_allclose(got, per_try, rtol=0, atol=1e-6)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_expm_chain_f32_rounding_motivates_norm_gate():
    """At f32 and moderate direction norms, the shared chain's extra
    squarings amplify rounding ~2-3 orders of magnitude beyond per-try
    matrix_exp — the measurement behind line_search's norm gate
    (final-semantics tiers fall back to per-try expm above ~2^-10;
    models/core.py). If this gap ever closes, the gate can go."""
    from picard_ica_tpu.ops.linalg import expm_pow2_chain

    rng = np.random.default_rng(11)
    a = rng.standard_normal((16, 16))
    d64 = (a - a.T) / 2.0
    d64 *= 0.5 / np.abs(d64).max()  # max|D| = 0.5
    d32 = jnp.asarray(d64, jnp.float32)
    n_alphas = 16

    chain, j = expm_pow2_chain(d32, n_alphas)
    ref = scipy.linalg.expm(d64)  # f64 truth at alpha = 1
    err_chain = np.abs(np.asarray(chain[int(j)], np.float64) - ref).max()
    err_per_try = np.abs(
        np.asarray(matrix_exp(d32), np.float64) - ref
    ).max()
    assert err_per_try < 1e-6
    assert err_chain > 50 * err_per_try  # the gap the gate exists for

    # And below the gate threshold the chain is eps-accurate.
    d_small = d32 * jnp.float32(2.0**-11 / 0.5)
    chain_s, j_s = expm_pow2_chain(d_small, n_alphas)
    ref_s = scipy.linalg.expm(np.asarray(d_small, np.float64))
    err_small = np.abs(
        np.asarray(chain_s[int(j_s)], np.float64) - ref_s
    ).max()
    assert err_small < 1e-6
