"""Eval metrics + data generators (reference: utils.rs tests; benchmarks.rs LCG)."""

import numpy as np
import pytest

from picard_ica_tpu.utils import (
    amari_distance,
    generate_bench_data,
    generate_test_data,
    permute,
)
from picard_ica_tpu.utils.datagen import _lcg_stream, _lcg_uniform


def test_amari_perfect_inverse():
    """(utils.rs:147-155)."""
    a = np.array([[1.0, 0.5, 0.2], [0.3, 1.0, 0.4], [0.1, 0.2, 1.0]])
    w = np.linalg.inv(a)
    assert amari_distance(w, a) < 1e-10


def test_amari_permutation_invariant():
    """(utils.rs:157-171)."""
    a = np.array([[1.0, 0.5], [0.3, 1.0]])
    w = np.linalg.inv(a)[[1, 0], :]
    assert amari_distance(w, a) < 1e-10


def test_amari_scaling_invariant():
    a = np.random.default_rng(0).standard_normal((4, 4))
    w = np.diag([2.0, -3.0, 0.5, 10.0]) @ np.linalg.inv(a)
    assert amari_distance(w, a) < 1e-10


def test_amari_positive_for_bad_unmixing():
    rng = np.random.default_rng(1)
    assert amari_distance(rng.standard_normal((3, 3)), rng.standard_normal((3, 3))) > 0.01


def test_permute_unit_diagonal():
    """(utils.rs:173-190)."""
    a = np.array([[0.1, 0.9], [0.95, 0.05]])
    p = permute(a, scale=True)
    assert p[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert p[1, 1] == pytest.approx(1.0, abs=1e-6)


def test_lcg_matches_scalar_recurrence():
    """Vectorized jump-ahead LCG == the scalar wrapping recurrence."""
    mul = np.uint64(6364136223846793005)
    s = np.uint64(42)
    expected = []
    with np.errstate(over="ignore"):
        for _ in range(100):
            s = s * mul + np.uint64(1)
            expected.append(int(s))
    states, last = _lcg_stream(42, 100)
    np.testing.assert_array_equal(states, np.asarray(expected, np.uint64))
    assert last == expected[-1]


def test_lcg_uniform_range():
    states, _ = _lcg_stream(42, 10000)
    u = _lcg_uniform(states)
    # (state >> 33) keeps 31 bits; divided by 2^31 -> [0, 1).
    assert (u >= 0).all() and (u < 1.0).all()
    assert 0.45 < (u < 0.5).mean() < 0.55  # roughly uniform


def test_generate_bench_data_deterministic():
    x1 = generate_bench_data(4, 100, seed=42)
    x2 = generate_bench_data(4, 100, seed=42)
    np.testing.assert_array_equal(x1, x2)
    x3 = generate_bench_data(4, 100, seed=43)
    assert not np.array_equal(x1, x3)


def test_generate_test_data_shapes_and_mixing():
    s, a, x = generate_test_data(3, 500, 42)
    assert s.shape == (3, 500) and a.shape == (3, 3) and x.shape == (3, 500)
    np.testing.assert_allclose(x, a @ s, atol=1e-12)
    # Laplace-ish sources: excess kurtosis clearly positive.
    k = ((s - s.mean(1, keepdims=True)) ** 4).mean(1) / (s.var(1) ** 2) - 3
    assert (k > 1.0).all()
