"""JADE warm start (reference: jade.rs tests + algorithmic equivalences)."""

import jax.numpy as jnp
import numpy as np
import pytest

from picard_ica_tpu.models.jade import (
    _pair_indices,
    compute_cumulant_matrices,
    jade,
)
from picard_ica_tpu.ops.whitening import center, whiten
from picard_ica_tpu.utils import amari_distance


def _mixed_sources(n, t, seed):
    rng = np.random.default_rng(seed)
    s = np.empty((n, t))
    for i in range(n):
        kind = i % 3
        if kind == 0:  # Laplace
            u = rng.uniform(0.001, 0.999, size=t)
            s[i] = np.sign(rng.standard_normal(t)) * (-np.log(u))
        elif kind == 1:  # uniform
            s[i] = rng.uniform(-1.73, 1.73, size=t)
        else:  # sqrt-compressed Gaussian (super)
            g = rng.standard_normal(t)
            s[i] = np.sign(g) * np.sqrt(np.abs(g))
    return s


def _whitened_mixture(n, t, seed):
    rng = np.random.default_rng(seed)
    s = _mixed_sources(n, t, seed)
    a = rng.standard_normal((n, n))
    x = a @ s
    centered, _ = center(jnp.asarray(x))
    return whiten(centered, n).data, a, s


def _naive_cumulants(x):
    """Direct O(N^4 T) mirror of jade.rs:78-131 for small cases."""
    n, t = x.shape
    xx = np.einsum("it,jt->ijt", x, x)
    mats = []
    for i in range(n):
        for j in range(i, n):
            q = np.empty((n, n))
            for k in range(n):
                for l in range(n):
                    e = float(np.dot(xx[i, j], xx[k, l])) / t
                    d1 = 1.0 if (i == j and k == l) else 0.0
                    d2 = 1.0 if (i == k and j == l) else 0.0
                    d3 = 1.0 if (i == l and j == k) else 0.0
                    q[k, l] = e - d1 - d2 - d3
            mats.append((q + q.T) / 2)
    return np.stack(mats)


def test_cumulants_match_naive():
    x, _, _ = _whitened_mixture(3, 500, 42)
    ours = np.asarray(compute_cumulant_matrices(x))
    naive = _naive_cumulants(np.asarray(x))
    np.testing.assert_allclose(ours, naive, atol=1e-8)


def test_cumulants_chunking_invariant():
    x, _, _ = _whitened_mixture(3, 1000, 1)
    full = np.asarray(compute_cumulant_matrices(x, chunk_size=1000))
    chunked = np.asarray(compute_cumulant_matrices(x, chunk_size=128))
    np.testing.assert_allclose(full, chunked, atol=1e-9)


def test_pair_count():
    pi, pj = _pair_indices(4)
    assert len(pi) == 4 * 5 // 2
    assert (pi <= pj).all()


def test_jade_output_orthogonal():
    """(jade.rs:208-256) W W^T == I."""
    x, _, _ = _whitened_mixture(3, 1000, 42)
    w, _ = jade(x, 100, 1e-6)
    np.testing.assert_allclose(np.asarray(w @ w.T), np.eye(3), atol=1e-6)


def test_jade_separates_mixed_kurtosis():
    """JADE alone recovers the sources (unlike the reference, whose
    sweeps oscillate — see models/jade.py notes)."""
    rng = np.random.default_rng(7)
    s = _mixed_sources(4, 20000, 7)
    a = rng.standard_normal((4, 4))
    x_raw = a @ s
    centered, _ = center(jnp.asarray(x_raw))
    wres = whiten(centered, 4)
    w, _ = jade(wres.data, 100, 1e-6)
    combined = np.asarray(w) @ np.asarray(wres.whitening_matrix)
    assert amari_distance(combined, a) < 0.01


def test_jade_single_component_identity():
    """(jade.rs:25-27) n < 2 returns identity."""
    x = jnp.ones((1, 100))
    w, _ = jade(x, 10, 1e-6)
    np.testing.assert_array_equal(np.asarray(w), np.eye(1))


def test_jade_rotation_equivalence_with_recompute():
    """Maintaining R = V^T Q V by conjugation == recomputing blocks
    from the original cumulants through V (the reference's formulation,
    jade.rs:148-159)."""
    x, _, _ = _whitened_mixture(3, 800, 3)
    cumulants = np.asarray(compute_cumulant_matrices(x))
    n = 3

    # One sweep, NumPy, recompute-through-V formulation.
    v = np.eye(n)
    angles_ref = []
    for p in range(n):
        for q in range(p + 1, n):
            g = np.zeros((2, 2))
            for m in cumulants:
                block = v[:, [p, q]].T @ m @ v[:, [p, q]]
                h_pq = block[0, 1] + block[1, 0]
                h_ppqq = block[0, 0] - block[1, 1]
                g[0, 0] += h_pq * h_pq
                g[0, 1] += h_pq * h_ppqq
                g[1, 1] += h_ppqq * h_ppqq
            diff = g[1, 1] - g[0, 0]
            if abs(g[0, 1]) < 1e-15 and abs(diff) < 1e-15:
                theta = 0.0
            else:
                theta = 0.25 * np.arctan2(2 * g[0, 1], diff)
            angles_ref.append(theta)
            c, s_ = np.cos(theta), np.sin(theta)
            vp, vq = v[:, p].copy(), v[:, q].copy()
            v[:, p] = c * vp + s_ * vq
            v[:, q] = -s_ * vp + c * vq

    # One sweep with the in-place conjugation formulation.
    v2 = np.eye(n)
    r = cumulants.copy()
    angles_ours = []
    for p in range(n):
        for q in range(p + 1, n):
            h_pq = r[:, p, q] + r[:, q, p]
            h_ppqq = r[:, p, p] - r[:, q, q]
            g00 = np.sum(h_pq**2)
            g01 = np.sum(h_pq * h_ppqq)
            g11 = np.sum(h_ppqq**2)
            diff = g11 - g00
            if abs(g01) < 1e-15 and abs(diff) < 1e-15:
                theta = 0.0
            else:
                theta = 0.25 * np.arctan2(2 * g01, diff)
            angles_ours.append(theta)
            c, s_ = np.cos(theta), np.sin(theta)
            vp, vq = v2[:, p].copy(), v2[:, q].copy()
            v2[:, p] = c * vp + s_ * vq
            v2[:, q] = -s_ * vp + c * vq
            rp, rq = r[:, p, :].copy(), r[:, q, :].copy()
            r[:, p, :] = c * rp + s_ * rq
            r[:, q, :] = -s_ * rp + c * rq
            cp, cq = r[:, :, p].copy(), r[:, :, q].copy()
            r[:, :, p] = c * cp + s_ * cq
            r[:, :, q] = -s_ * cp + c * cq

    np.testing.assert_allclose(angles_ours, angles_ref, atol=1e-10)
    np.testing.assert_allclose(v2, v, atol=1e-10)
