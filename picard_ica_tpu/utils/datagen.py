"""Synthetic ICA data generators.

``generate_bench_data`` reproduces the reference benchmark generator
bit-for-bit in the integer domain (benches/benchmarks.rs:8-35): an LCG
(``state * 6364136223846793005 + 1`` on wrapping u64), Laplace sources
by inverse CDF, uniform(-0.5, 0.5) mixing — so conformance runs see
the *same* mixtures as the Rust reference.

``generate_test_data`` mirrors the reference test fixture
(src/solver.rs:257-286): Laplace-ish sources ``sign * (-ln u)`` and a
standard-normal mixing matrix (seeded NumPy RNG instead of Rust's
StdRng — same distribution, different stream).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_LCG_MUL = np.uint64(6364136223846793005)
_LCG_INC = np.uint64(1)


def _lcg_stream(state: int, count: int) -> Tuple[np.ndarray, int]:
    """Generate ``count`` u64 LCG states starting after ``state``.

    Vectorized closed form: s_k = A^k s_0 + (1 + A + ... + A^{k-1})
    mod 2^64, using numpy's wrapping uint64 arithmetic — bit-identical
    to the scalar recurrence but O(count) vector work.
    """
    s0 = np.uint64(state)
    with np.errstate(over="ignore"):
        pows = np.multiply.accumulate(np.full(count, _LCG_MUL, dtype=np.uint64))
        geo = np.cumsum(
            np.concatenate([np.ones(1, np.uint64), pows[:-1]]), dtype=np.uint64
        )
        states = pows * s0 + geo
    return states, int(states[-1])


def _lcg_uniform(states: np.ndarray) -> np.ndarray:
    """Map LCG states to [0, 1) doubles exactly as benchmarks.rs:16
    (31 retained bits over 2^31)."""
    return (states >> np.uint64(33)).astype(np.float64) / float(1 << 31)


def generate_bench_data(n_features: int, n_samples: int, seed: int = 42) -> np.ndarray:
    """Mixed Laplace data identical to the reference benchmark harness.

    Uses the native OpenMP generator when available (~50x faster at
    64M samples; identical integer stream, f64 values within 1 ulp of
    the NumPy path — bit-identical after the f32 cast TPU runs use);
    falls back to the vectorized NumPy closed form.
    """
    from .. import native

    if native.available():
        data_flat, state = native.lcg_laplace(seed, n_features * n_samples)
        data = data_flat.reshape(n_features, n_samples)
        mix_flat, _ = native.lcg_uniform_centered(state, n_features * n_features)
        mixing = mix_flat.reshape(n_features, n_features)
        return mixing @ data

    states, state = _lcg_stream(seed, n_features * n_samples)
    u = _lcg_uniform(states)
    data = np.where(u < 0.5, np.log(np.maximum(2.0 * u, 1e-300)), -np.log(np.maximum(2.0 * (1.0 - u), 1e-300)))
    data = data.reshape(n_features, n_samples)

    states, _ = _lcg_stream(state, n_features * n_features)
    mixing = _lcg_uniform(states).reshape(n_features, n_features) - 0.5

    return mixing @ data


def generate_test_data(n: int, t: int, seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Seeded (sources, mixing, mixed) fixture (solver.rs:257-286)."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(1e-12, 1.0, size=(n, t))
    sign = np.where(rng.random((n, t)) < 0.5, 1.0, -1.0)
    sources = sign * (-np.log(u))
    mixing = rng.standard_normal((n, n))
    return sources, mixing, mixing @ sources


def generate_mixed_kurtosis_data(n: int, t: int, seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mixed sub/super-Gaussian fixture for extended-mode tests
    (modeled on jade.rs:209-243): alternating Laplace (super) and
    uniform (sub) sources."""
    rng = np.random.default_rng(seed)
    sources = np.empty((n, t))
    for i in range(n):
        if i % 2 == 0:
            u = rng.uniform(1e-12, 1.0, size=t)
            sign = np.where(rng.random(t) < 0.5, 1.0, -1.0)
            sources[i] = sign * (-np.log(u))
        else:
            sources[i] = rng.uniform(-np.sqrt(3.0), np.sqrt(3.0), size=t)
    mixing = rng.standard_normal((n, n))
    return sources, mixing, mixing @ sources
