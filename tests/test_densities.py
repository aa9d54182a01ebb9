"""Density plugin self-consistency (reference: utils.rs:110-137 + density tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from picard_ica_tpu import Cube, DensityType, Exp, Tanh
from picard_ica_tpu.utils import check_density


@pytest.mark.parametrize(
    "density", [Tanh(), Tanh(1.5), Exp(0.1), Exp(1.0), Cube()], ids=str
)
def test_score_is_loglik_gradient(density):
    """Analytic score == finite-difference d/dy log_lik (utils.rs:193-208)."""
    assert check_density(density, tol=1e-5)


@pytest.mark.parametrize("density", [Tanh(), Exp(), Cube()], ids=str)
def test_score_der_is_score_gradient(density):
    """psi' == finite-difference derivative of psi."""
    y = jnp.linspace(-2.0, 2.0, 41, dtype=jnp.float64).reshape(1, -1)
    eps = 1e-6
    s_plus, _ = density.score_and_der(y + eps)
    s_minus, _ = density.score_and_der(y - eps)
    _, der = density.score_and_der(y)
    np.testing.assert_allclose((s_plus - s_minus) / (2 * eps), der, atol=1e-6)


def test_shapes_preserved():
    y = jnp.ones((3, 7))
    for d in [Tanh(), Exp(), Cube()]:
        s, ds = d.score_and_der(y)
        assert s.shape == (3, 7) and ds.shape == (3, 7)
        assert d.log_lik(y).shape == (3, 7)


def test_tanh_loglik_stable_at_large_y():
    """|y| + log(1+e^{-2a|y|})/a must not overflow for large |y|."""
    y = jnp.asarray([[1e3, -1e3, 1e6]])
    ll = Tanh().log_lik(y)
    assert bool(jnp.all(jnp.isfinite(ll)))
    # For large |y| the log term vanishes: log_lik -> |y|.
    np.testing.assert_allclose(np.asarray(ll), np.abs(np.asarray(y)), rtol=1e-12)


def test_known_values():
    y = jnp.asarray([[0.5]])
    s, ds = Tanh().score_and_der(y)
    np.testing.assert_allclose(float(s[0, 0]), np.tanh(0.5), rtol=1e-12)
    np.testing.assert_allclose(float(ds[0, 0]), 1 - np.tanh(0.5) ** 2, rtol=1e-12)

    s, ds = Cube().score_and_der(y)
    assert float(s[0, 0]) == pytest.approx(0.125)
    assert float(ds[0, 0]) == pytest.approx(0.75)
    assert float(Cube().log_lik(y)[0, 0]) == pytest.approx(0.5**4 / 4)


def test_density_type_constructors():
    assert DensityType.tanh() == Tanh()
    assert DensityType.tanh_with_alpha(2.0) == Tanh(2.0)
    assert DensityType.exp() == Exp()
    assert DensityType.exp_with_alpha(0.5) == Exp(0.5)
    assert DensityType.cube() == Cube()


def test_densities_hashable_for_jit_static():
    assert hash(Tanh()) == hash(Tanh(1.0))
    assert Tanh(1.0) != Tanh(2.0)


def test_log_lik_delta_matches_direct_subtraction():
    """Analytic delta == ll(y+dy) - ll(y) at f64 accuracy, including
    sign crossings and tiny steps."""
    import numpy as np

    from picard_ica_tpu.ops.densities import Cube, Exp, Tanh

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((3, 512)) * 2.0)
    for scale in [1.0, 1e-4, 1e-9]:
        dy = jnp.asarray(rng.standard_normal((3, 512)) * scale)
        for den in [Tanh(), Tanh(0.7), Exp(0.5), Cube()]:
            direct = np.asarray(den.log_lik(y + dy) - den.log_lik(y))
            analytic = np.asarray(den.log_lik_delta(y, dy))
            # The DIRECT subtraction carries ~eps * |log_lik| noise
            # (that is the point of the analytic form), so compare in
            # absolute terms at that noise level.
            np.testing.assert_allclose(analytic, direct, atol=5e-13, rtol=1e-5)


def test_log_lik_delta_first_order_consistency():
    """For infinitesimal dy, delta ~= psi(y) * dy (score = d ll/dy)."""
    import numpy as np

    from picard_ica_tpu.ops.densities import Cube, Exp, Tanh

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 256)))
    dy = jnp.asarray(rng.standard_normal((2, 256)) * 1e-10)
    for den in [Tanh(), Exp(0.5), Cube()]:
        psi, _ = den.score_and_der(y)
        expected = np.asarray(psi) * np.asarray(dy)
        got = np.asarray(den.log_lik_delta(y, dy))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-24)


def test_log_lik_delta_extreme_tails_no_nan():
    """Underflow * overflow (0 * inf) regression: large |y_old| with an
    origin-ward step must give a finite, accurate delta (the product
    form e_b * expm1(t) NaNs at e.g. Tanh(90, -45), Exp(13.5, -12))."""
    import numpy as np

    from picard_ica_tpu.ops.densities import Cube, Exp, Tanh

    cases = [
        (Tanh(), 90.0, -45.0),
        (Tanh(), -90.0, 45.0),
        (Exp(), 13.5, -12.0),
        (Exp(0.5), 20.0, -18.0),
        (Cube(), 50.0, -20.0),
    ]
    for den, y0, d in cases:
        y0_a = jnp.asarray([[y0]])
        d_a = jnp.asarray([[d]])
        got = float(den.log_lik_delta(y0_a, d_a)[0, 0])
        want = float(den.log_lik(y0_a + d_a)[0, 0] - den.log_lik(y0_a)[0, 0])
        assert np.isfinite(got), f"{den} NaN at ({y0}, {d})"
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_score_der_loglik_delta_consistent():
    """The fused method equals its separate primitives."""
    import numpy as np

    from picard_ica_tpu.ops.densities import Cube, Exp, Tanh

    rng = np.random.default_rng(2)
    y0 = jnp.asarray(rng.standard_normal((2, 256)) * 2)
    dy = jnp.asarray(rng.standard_normal((2, 256)) * 0.1)
    for den in [Tanh(), Tanh(0.7), Exp(0.5), Cube()]:
        psi_f, psi_d_f, dll_f = den.score_der_loglik_delta(y0, dy)
        psi, psi_d = den.score_and_der(y0 + dy)
        np.testing.assert_allclose(np.asarray(psi_f), np.asarray(psi), rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(np.asarray(psi_d_f), np.asarray(psi_d), rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(
            np.asarray(dll_f), np.asarray(den.log_lik_delta(y0, dy)),
            rtol=1e-12, atol=1e-14,
        )


def test_tanh_f32_native_delta_accuracy_vs_f64():
    """The f32 delta form (native tanh + back-derived e_a; only taken
    for f32 inputs, densities._TANH_NATIVE_DELTA) must track the exact
    f64 form at f32 grade: psi/psi' to a few ULP, dll within the
    documented ~1e-6 relative-to-scale bound, with NO outliers in the
    large-|t| branch where e_a is back-derived from tanh."""
    import numpy as np

    from picard_ica_tpu.ops.densities import Tanh

    rng = np.random.default_rng(7)
    # Wide dynamic range incl. the crossing and large-step branches.
    y0 = np.concatenate([
        rng.standard_normal(4096) * 3,
        rng.standard_normal(256) * 30,       # saturated tanh region
        rng.uniform(-0.05, 0.05, 256),       # near-zero lanes
    ])
    dy = np.concatenate([
        rng.standard_normal(4096) * 0.3,
        -y0[4096:4352] * rng.uniform(0.9, 1.6, 256),  # sign crossings
        rng.standard_normal(256) * 0.01,
    ])
    for den in [Tanh(), Tanh(0.7)]:
        p64, d64, ll64 = den.score_der_loglik_delta(
            jnp.asarray(y0[None], jnp.float64), jnp.asarray(dy[None], jnp.float64)
        )
        p32, d32, ll32 = den.score_der_loglik_delta(
            jnp.asarray(y0[None], jnp.float32), jnp.asarray(dy[None], jnp.float32)
        )
        # psi/psi' budget: the f32 inputs themselves round (y0 + dy in
        # f32 before tanh), worth up to a*|y|*eps through the chain —
        # dominate over the form's own error (exact tanh identity).
        np.testing.assert_allclose(np.asarray(p32), np.asarray(p64),
                                   rtol=5e-5, atol=5e-6)
        np.testing.assert_allclose(np.asarray(d32), np.asarray(d64),
                                   rtol=5e-5, atol=1e-5)
        # dll error budget: absolute vs the element's own |dll| + the
        # f32 rounding of its inputs (|y|, |dy| scale).
        scale = np.abs(np.asarray(ll64)) + np.abs(y0) * 1e-6 + 1e-6
        err = np.abs(np.asarray(ll32, np.float64) - np.asarray(ll64))
        # 2e-4: ~1.5e3 f32 ULP headroom for input rounding through the
        # cancellation in d_abs + log1p on tiny-|dll| lanes; a FORM
        # error (wrong branch / bad e_a derivation) shows up orders of
        # magnitude above this.
        assert np.max(err / scale) < 2e-4, float(np.max(err / scale))
