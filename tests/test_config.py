"""Config defaults, builder, and validation (reference: config.rs tests + rules)."""

import pytest

from picard_ica_tpu import ConfigBuilder, InvalidConfigError, PicardConfig, Tanh


def test_defaults_match_reference():
    cfg = PicardConfig()
    assert isinstance(cfg.density, Tanh) and cfg.density.alpha == 1.0
    assert cfg.n_components is None
    assert cfg.ortho is True
    assert cfg.extended is None
    assert cfg.whiten is True
    assert cfg.centering is True
    assert cfg.max_iter == 500
    assert cfg.tol == 1e-7
    assert cfg.m == 7
    assert cfg.ls_tries == 10
    assert cfg.lambda_min == 0.01
    assert cfg.w_init is None
    assert cfg.fastica_it is None
    assert cfg.jade_it is None
    assert cfg.random_state is None
    assert cfg.verbose is False


def test_effective_extended_defaults_to_ortho():
    assert PicardConfig(ortho=True).effective_extended() is True
    assert PicardConfig(ortho=False).effective_extended() is False
    assert PicardConfig(ortho=True, extended=False).effective_extended() is False
    assert PicardConfig(ortho=False, extended=True).effective_extended() is True


def test_builder_fluent():
    cfg = (
        PicardConfig.builder()
        .n_components(5)
        .max_iter(200)
        .ortho(False)
        .extended(True)
        .tol(1e-6)
        .m(5)
        .ls_tries(8)
        .lambda_min(0.1)
        .random_state(42)
        .verbose(True)
        .build()
    )
    assert cfg.n_components == 5
    assert cfg.max_iter == 200
    assert cfg.ortho is False
    assert cfg.extended is True
    assert cfg.tol == 1e-6
    assert cfg.m == 5
    assert cfg.ls_tries == 8
    assert cfg.lambda_min == 0.1
    assert cfg.random_state == 42
    assert cfg.verbose is True


@pytest.mark.parametrize(
    "kwargs,param",
    [
        ({"max_iter": 0}, "max_iter"),
        ({"tol": 0.0}, "tol"),
        ({"tol": -1.0}, "tol"),
        ({"lambda_min": 0.0}, "lambda_min"),
        ({"m": 0}, "m"),
        ({"fastica_it": 5, "jade_it": 5}, "jade_it"),
    ],
)
def test_validation_rejects(kwargs, param):
    with pytest.raises(InvalidConfigError) as exc_info:
        PicardConfig(**kwargs).validate()
    assert exc_info.value.parameter == param


def test_build_validated_raises():
    with pytest.raises(InvalidConfigError):
        ConfigBuilder().fastica_it(10).jade_it(10).build_validated()


def test_valid_config_passes():
    PicardConfig().validate()
    PicardConfig(fastica_it=3).validate()
    PicardConfig(jade_it=3).validate()


def test_raise_on_no_convergence():
    import pytest

    from picard_ica_tpu import NotConvergedError, Picard, PicardConfig
    from picard_ica_tpu.utils.datagen import generate_test_data

    _, _, x = generate_test_data(4, 2000, seed=2)
    cfg = PicardConfig(max_iter=1, tol=1e-12, random_state=0,
                       raise_on_no_convergence=True)
    with pytest.raises(NotConvergedError) as exc:
        Picard.fit(x, cfg)
    assert exc.value.iterations == 1
    assert exc.value.tolerance == 1e-12

    # Default semantics unchanged: warn-and-return (solver.rs:171-177).
    res = Picard.fit(x, cfg.replace(raise_on_no_convergence=False))
    assert not res.converged
