"""On-disk oracle-result cache (benchmarks/suite._oracle_core_cached).

The suite's conformance/baseline rows rerun the f64 C++ oracle —
minutes per call at T >= 500k on this box's single core. The cache must
(a) reproduce the uncached result exactly, (b) key on everything that
determines it (input bytes, covariance, solver params, oracle source),
and (c) never return the bulky ``y`` field no suite row reads.
"""

import numpy as np
import pytest

from picard_ica_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


@pytest.fixture()
def suite(monkeypatch, tmp_path):
    import benchmarks.suite as suite_mod

    monkeypatch.setattr(suite_mod, "_REPO_ROOT", str(tmp_path))
    monkeypatch.setattr(suite_mod, "_ORACLE_CACHE", True)
    return suite_mod


def _toy_input(n=6, t=4096, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(1e-9, 1.0, size=(n, t))
    x = np.sign(rng.standard_normal((n, t))) * (-np.log(u))
    xc, _ = native.oracle_center(x)
    xw, _ = native.oracle_whiten(xc, n)
    return xw


def test_cache_roundtrip_matches_uncached(suite, tmp_path):
    xw = _toy_input()
    cov = np.eye(xw.shape[0])
    direct = native.oracle_core(xw, cov, max_iter=50, tol=1e-7)

    first = suite._oracle_core_cached(xw, cov, max_iter=50, tol=1e-7)
    files = list((tmp_path / ".bench_cache").glob("oracle_*.npz"))
    assert len(files) == 1, "miss must write exactly one cache entry"
    second = suite._oracle_core_cached(xw, cov, max_iter=50, tol=1e-7)

    for res in (first, second):
        assert "y" not in res
        np.testing.assert_array_equal(res["w"], direct["w"])
        np.testing.assert_array_equal(res["signs"], direct["signs"])
        assert res["n_iterations"] == direct["n_iterations"]
        assert res["converged"] == direct["converged"]
        assert res["gradient_norm"] == direct["gradient_norm"]
    assert isinstance(second["n_iterations"], int)
    assert isinstance(second["converged"], bool)


def test_cache_keys_on_params_and_input(suite, tmp_path):
    xw = _toy_input()
    cov = np.eye(xw.shape[0])
    suite._oracle_core_cached(xw, cov, max_iter=50, tol=1e-7)
    # Different solver param -> new entry (not a stale hit).
    r5 = suite._oracle_core_cached(xw, cov, max_iter=5, tol=1e-7)
    assert r5["n_iterations"] <= 5
    # Different input bytes -> new entry.
    suite._oracle_core_cached(_toy_input(seed=1), cov, max_iter=50, tol=1e-7)
    # No covariance (non-extended shape) -> new entry.
    suite._oracle_core_cached(xw, None, extended=False, max_iter=50, tol=1e-7)
    files = list((tmp_path / ".bench_cache").glob("oracle_*.npz"))
    assert len(files) == 4


def test_cache_disabled_by_flag(suite, tmp_path):
    suite._ORACLE_CACHE = False
    xw = _toy_input()
    suite._oracle_core_cached(xw, np.eye(xw.shape[0]), max_iter=20, tol=1e-7)
    assert not (tmp_path / ".bench_cache").exists()
