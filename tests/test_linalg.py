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
