"""End-to-end fit tests (reference: solver.rs:251-409 test module, strengthened
with Amari-distance separation checks per SURVEY.md §4)."""

import numpy as np
import pytest

from picard_ica_tpu import (
    Cube,
    Exp,
    InvalidConfigError,
    InvalidDimensionsError,
    Picard,
    PicardConfig,
)
from picard_ica_tpu.utils import (
    amari_distance,
    generate_mixed_kurtosis_data,
    generate_test_data,
)


def test_fit_default_shapes():
    """(solver.rs:288-298)."""
    _, _, x = generate_test_data(3, 1000, 42)
    result = Picard.fit(x)
    assert result.sources.shape == (3, 1000)
    assert result.unmixing.shape == (3, 3)
    assert result.whitening.shape == (3, 3)
    assert result.mean.shape == (3,)


def test_fit_separates_sources():
    """Stronger than the reference's shape check: actual separation."""
    _, a, x = generate_test_data(4, 5000, 42)
    result = Picard.fit(x, PicardConfig(random_state=0))
    assert result.converged
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 5e-3


def test_iteration_cap_respected():
    """(solver.rs:300-313)."""
    _, _, x = generate_test_data(3, 1000, 42)
    result = Picard.fit(x, PicardConfig(max_iter=3, random_state=42))
    assert result.n_iterations <= 3


def test_fit_with_jade_warmstart():
    """(solver.rs:315-329)."""
    _, a, x = generate_test_data(3, 2000, 42)
    result = Picard.fit(x, PicardConfig(jade_it=50, random_state=42))
    assert result.sources.shape[0] == 3
    assert result.converged
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 1e-2


def test_fastica_warmstart():
    _, a, x = generate_test_data(4, 3000, 123)
    result = Picard.fit(x, PicardConfig(fastica_it=10, random_state=42))
    assert result.converged
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 1e-2


def test_n_components_reduction():
    """(solver.rs:357-370)."""
    _, _, x = generate_test_data(5, 1000, 42)
    result = Picard.fit(x, PicardConfig(n_components=3, random_state=42))
    assert result.sources.shape == (3, 1000)
    assert result.unmixing.shape == (3, 3)
    assert result.whitening.shape == (3, 5)


def test_transform_matches_sources():
    """(solver.rs:372-384) transform(fit data) == sources."""
    _, _, x = generate_test_data(3, 1000, 42)
    result = Picard.fit(x, PicardConfig(random_state=42))
    transformed = Picard.transform(x, result)
    assert transformed.shape == result.sources.shape
    np.testing.assert_allclose(
        np.asarray(transformed), np.asarray(result.sources), atol=1e-8
    )


def test_no_whiten():
    """(solver.rs:386-398)."""
    _, a, x = generate_test_data(3, 2000, 42)
    result = Picard.fit(x, PicardConfig(whiten=False, ortho=False, random_state=42))
    assert result.whitening is None
    assert result.unmixing.shape == (3, 3)


def test_no_centering():
    _, _, x = generate_test_data(3, 1000, 42)
    result = Picard.fit(x, PicardConfig(centering=False, random_state=42))
    assert result.mean is None


def test_cannot_use_both_warmstarts():
    """(solver.rs:400-408)."""
    _, _, x = generate_test_data(3, 100, 42)
    with pytest.raises(InvalidConfigError):
        Picard.fit(x, PicardConfig(fastica_it=10, jade_it=10))


def test_empty_input_rejected():
    with pytest.raises(InvalidDimensionsError):
        Picard.fit(np.zeros((0, 10)))
    with pytest.raises(InvalidDimensionsError):
        Picard.fit(np.zeros((3, 0)))


def test_w_init_shape_checked():
    """(solver.rs:98-111)."""
    _, _, x = generate_test_data(3, 500, 42)
    with pytest.raises(InvalidDimensionsError):
        Picard.fit(x, PicardConfig(w_init=np.eye(4)))


def test_w_init_used():
    _, a, x = generate_test_data(3, 3000, 42)
    # Fit once, reuse the unmixing as w_init: should converge immediately.
    first = Picard.fit(x, PicardConfig(random_state=0))
    again = Picard.fit(x, PicardConfig(w_init=np.asarray(first.unmixing)))
    assert again.n_iterations <= first.n_iterations


def test_non_ortho_mode():
    _, a, x = generate_test_data(4, 5000, 7)
    result = Picard.fit(x, PicardConfig(ortho=False, random_state=0))
    assert result.converged
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 5e-3
    assert result.signs is None  # extended defaults to ortho=False


def test_extended_mixed_kurtosis_sign_recovery():
    """Extended mode flags sub vs super-Gaussian components."""
    _, a, x = generate_mixed_kurtosis_data(4, 8000, 3)
    result = Picard.fit(x, PicardConfig(extended=True, random_state=0))
    assert result.converged
    assert result.signs is not None
    signs = np.sort(np.asarray(result.signs))
    # 2 sub-Gaussian (uniform) + 2 super-Gaussian (Laplace) sources.
    np.testing.assert_array_equal(signs, [-1.0, -1.0, 1.0, 1.0])
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 5e-3


def test_extended_non_ortho():
    _, a, x = generate_mixed_kurtosis_data(4, 8000, 5)
    result = Picard.fit(x, PicardConfig(ortho=False, extended=True, random_state=0))
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 1e-2


def test_cube_density_on_subgaussian():
    rng = np.random.default_rng(11)
    s = rng.uniform(-np.sqrt(3), np.sqrt(3), size=(3, 8000))
    a = rng.standard_normal((3, 3))
    x = a @ s
    result = Picard.fit(
        x, PicardConfig(density=Cube(), extended=False, random_state=0)
    )
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 1e-2


def test_exp_density():
    _, a, x = generate_test_data(3, 5000, 9)
    result = Picard.fit(
        x, PicardConfig(density=Exp(0.1), extended=False, random_state=0)
    )
    assert amari_distance(np.asarray(result.full_unmixing()), a) < 1e-2


def test_mixing_is_pseudo_inverse():
    _, _, x = generate_test_data(3, 2000, 42)
    result = Picard.fit(x, PicardConfig(random_state=0))
    w_full = np.asarray(result.full_unmixing())
    mixing = np.asarray(result.mixing())
    np.testing.assert_allclose(w_full @ mixing, np.eye(3), atol=1e-8)


def test_reproducible_with_seed():
    _, _, x = generate_test_data(3, 1000, 42)
    r1 = Picard.fit(x, PicardConfig(random_state=123))
    r2 = Picard.fit(x, PicardConfig(random_state=123))
    np.testing.assert_array_equal(np.asarray(r1.unmixing), np.asarray(r2.unmixing))


def test_density_warning_config():
    _, _, x = generate_test_data(3, 500, 42)
    with pytest.warns(RuntimeWarning):
        Picard.fit(
            x,
            PicardConfig(
                density=Cube(), extended=True, ortho=False, max_iter=5, random_state=0
            ),
        )


def test_nan_input_graceful():
    """NaN data must not crash: fit returns converged=False with a
    non-finite gradient norm (numerical failure is reported, not
    raised — matching the reference's value-based error philosophy)."""
    import numpy as np

    x = np.full((4, 1000), np.nan)
    result = Picard.fit(x, PicardConfig(random_state=0, max_iter=5, whiten=False))
    assert not result.converged
    assert not np.isfinite(result.gradient_norm)


def test_rank_deficient_data_raises():
    """Rank-deficient data hits the whitening sigma < 1e-10 rejection
    (whitening.rs:71-79)."""
    import numpy as np
    import pytest

    from picard_ica_tpu.errors import SingularMatrixError

    rng = np.random.default_rng(0)
    row = rng.standard_normal(5000)
    x = np.stack([row, row, rng.standard_normal(5000)])  # rank 2 of 3
    with pytest.raises(SingularMatrixError):
        Picard.fit(x, PicardConfig(random_state=0))


def test_one_dimensional_input_rejected():
    import numpy as np
    import pytest

    from picard_ica_tpu.errors import InvalidDimensionsError

    with pytest.raises(InvalidDimensionsError):
        Picard.fit(np.zeros(100), PicardConfig())


def test_n_components_exceeding_n_clamps():
    """n_components > min(n, p) clamps rather than erroring (solver.rs:63)."""
    _, _, x = generate_test_data(4, 3000, seed=1)
    result = Picard.fit(x, PicardConfig(n_components=99, random_state=0, max_iter=50))
    assert result.unmixing.shape == (4, 4)


def test_host_f64_preprocessing_path():
    """f64 NumPy input + f32 core -> host-f64 whitening basis (the
    reference-parity pipeline; config.whiten_precision docs)."""
    s, a, x = generate_test_data(5, 4000, seed=3)
    import jax.numpy as jnp

    x = np.asarray(x, np.float64)
    res = Picard.fit(x, PicardConfig(random_state=0, dtype="float32"))
    assert res.unmixing.dtype == jnp.float32

    # The whitening matrix must match the NumPy f64 construction to
    # cast precision (the device-f32 covariance path would differ by
    # far more through the eigengap amplification).
    xc = x - x.mean(axis=1, keepdims=True)
    u, sv, _ = np.linalg.svd(xc, full_matrices=False)
    k_ref = (u / sv).T * np.sqrt(x.shape[1])
    for i in range(k_ref.shape[0]):
        j = np.argmax(np.abs(k_ref[i]))
        if k_ref[i, j] < 0:
            k_ref[i] = -k_ref[i]
    np.testing.assert_allclose(
        np.asarray(res.whitening, np.float64), k_ref, atol=1e-5
    )


def test_whiten_precision_f64_requires_host_array():
    import jax.numpy as jnp

    _, _, x = generate_test_data(4, 1000, seed=4)
    with pytest.raises(InvalidDimensionsError):
        Picard.fit(jnp.asarray(x), PicardConfig(whiten_precision="f64"))


def test_whiten_precision_device_forces_device_path():
    _, a, x = generate_test_data(4, 4000, seed=5)
    res = Picard.fit(
        np.asarray(x, np.float64),
        PicardConfig(random_state=0, whiten_precision="device", tol=1e-5),
    )
    from picard_ica_tpu.utils import amari_distance

    assert amari_distance(np.asarray(res.full_unmixing()), a) < 5e-2


def test_result_diagnostics_and_verbose_summary(capsys):
    """Observability: stage exits / line-search pass counts ride the
    result, and verbose prints a post-fit summary that works on
    backends without host callbacks (SURVEY.md §5 metrics row)."""
    _, _, x = generate_test_data(4, 3000, seed=6)
    res = Picard.fit(
        x, PicardConfig(random_state=0, verbose=True, max_iter=80, tol=1e-5)
    )
    assert res.stage_precisions is not None
    assert len(res.stage_precisions) == len(res.stage_exits)
    assert res.stage_exits[-1] == res.n_iterations
    # Every iteration but the last runs at least one fused pass.
    assert res.ls_calls >= res.n_iterations - 1
    # Per-stage cumulative pass counts align with the stage exits and
    # end at the total.
    assert len(res.stage_ls_calls) == len(res.stage_exits)
    assert res.stage_ls_calls[-1] == res.ls_calls
    assert all(b >= a for a, b in zip(res.stage_ls_calls, res.stage_ls_calls[1:]))
    err = capsys.readouterr().err
    assert "line-search passes" in err
