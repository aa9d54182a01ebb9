"""Pairwise config-matrix sweep of the public fit surface.

Individual options are covered by tests/test_solver.py; this sweep
pins the INTERACTIONS (reference surface: every config.rs field can
combine with every other — solver.rs:33-214 has no combination gates
beyond the fastica/jade exclusivity). Each row must fit without
crashing and return a structurally sane result; separation quality is
asserted only where the row converges (tiny T keeps the sweep fast).
"""

import warnings

import numpy as np
import pytest

from picard_ica_tpu import Picard, PicardConfig
from picard_ica_tpu.ops.densities import Cube, Exp, Tanh
from picard_ica_tpu.utils.datagen import (
    generate_mixed_kurtosis_data,
    generate_test_data,
)

N, T = 5, 4096


def _data(kind):
    if kind == "mixed":
        _, mixing, x = generate_mixed_kurtosis_data(N, T, seed=3)
        return np.asarray(x, np.float64)
    _, _, x = generate_test_data(N, T, 3)
    return np.asarray(x, np.float64)


def _prewhitened():
    x = _data("laplace")
    x = x - x.mean(axis=1, keepdims=True)
    cov = x @ x.T / x.shape[1]
    vals, vecs = np.linalg.eigh(cov)
    return (vecs / np.sqrt(vals)) @ vecs.T @ x


# (ortho, extended, density, whiten, centering, n_components, warm, data)
# — a pairwise-style selection over the risky dimensions.
CASES = [
    (True, True, Tanh(), True, True, None, None, "laplace"),
    (True, False, Tanh(), True, True, None, "jade", "laplace"),
    (True, True, Exp(), True, True, 3, None, "laplace"),
    (False, False, Tanh(), True, True, None, "fastica", "laplace"),
    (False, True, Tanh(), True, True, None, None, "mixed"),
    (True, True, Cube(), True, True, None, "jade", "mixed"),
    (False, False, Exp(), True, False, None, None, "laplace"),
    (True, True, Tanh(), False, True, None, None, "white"),
    (False, False, Cube(), True, True, 3, None, "mixed"),
    (True, False, Exp(), True, True, None, "fastica", "laplace"),
    (False, True, Cube(), True, True, None, None, "mixed"),
    (True, False, Cube(), False, False, None, None, "white"),
    (True, True, Tanh(), True, True, 3, "fastica", "laplace"),
    (False, False, Tanh(), False, True, None, "jade", "white"),
    (True, True, Exp(), True, True, None, "jade", "laplace"),
    (False, True, Exp(), True, True, None, None, "mixed"),
]


@pytest.mark.parametrize(
    "ortho,extended,density,whiten,centering,k,warm,data_kind",
    CASES,
    ids=[
        f"{'o' if o else 'n'}{'x' if e else 's'}-{type(d).__name__.lower()}"
        f"{'-nowhiten' if not w else ''}{'-nocenter' if not c else ''}"
        f"{f'-k{k}' if k else ''}{f'-{wm}' if wm else ''}"
        for o, e, d, w, c, k, wm, _ in CASES
    ],
)
def test_config_combination_fits(
    ortho, extended, density, whiten, centering, k, warm, data_kind
):
    x = _prewhitened() if data_kind == "white" else _data(data_kind)
    cfg = PicardConfig(
        ortho=ortho,
        extended=extended,
        density=density,
        whiten=whiten,
        centering=centering,
        n_components=k,
        jade_it=(5 if warm == "jade" else None),
        fastica_it=(5 if warm == "fastica" else None),
        random_state=0,
        tol=1e-4,
        max_iter=25,
    )
    # The reference warns (not raises) on non-tanh + extended +
    # non-ortho (solver.rs:69-74); everything else must be silent of
    # RuntimeWarnings from the fit itself.
    expect_warn = (
        not isinstance(density, Tanh) and cfg.effective_extended() and not ortho
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = Picard.fit(x, cfg)
    runtime = [w for w in caught if issubclass(w.category, RuntimeWarning)]
    if expect_warn:
        assert runtime, "expected the problematic-configuration warning"

    n_out = k if k else N
    assert res.sources.shape == (n_out, T)
    assert np.asarray(res.unmixing).shape == (n_out, n_out)
    assert res.n_iterations <= 25
    if expect_warn and not np.all(np.isfinite(np.asarray(res.unmixing))):
        # The warned configuration genuinely overflows — the f64
        # reference-semantics oracle NaNs on the identical input
        # (cube+extended+non-ortho on this mixed-kurtosis mixture:
        # oracle_core returns all-NaN W while vacuously reporting
        # convergence). Diverging like the reference IS the parity
        # behavior; the warning above is the user-facing contract.
        return
    assert np.all(np.isfinite(np.asarray(res.unmixing)))
    assert np.all(np.isfinite(np.asarray(res.sources)))
    # full_unmixing @ x reproduces the sources (centering removed).
    xw = np.asarray(x, np.float64)
    if centering and res.mean is not None:
        xw = xw - np.asarray(res.mean)[:, None]
    y = np.asarray(res.full_unmixing(), np.float64) @ xw
    np.testing.assert_allclose(
        y, np.asarray(res.sources, np.float64), rtol=5e-4, atol=5e-4
    )
    # transform() agrees with the fit's own sources on the same data.
    y2 = Picard.transform(np.asarray(x), res)
    np.testing.assert_allclose(
        np.asarray(y2, np.float64),
        np.asarray(res.sources, np.float64),
        rtol=5e-4,
        atol=5e-4,
    )
