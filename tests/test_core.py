"""Core-loop internals: L-BFGS ring memory, Hessian helpers, line search,
loss (reference behaviors: core.rs, lbfgs.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from picard_ica_tpu.models.core import (
    CoreOptions,
    LbfgsMemory,
    _push_memory,
    compute_direction,
    compute_loss,
    line_search,
    regularize_hessian,
    run_core,
    solve_hessian_system,
)
from picard_ica_tpu.ops.densities import Tanh


def _empty_memory(m, n, dtype=jnp.float64):
    return LbfgsMemory(
        s_mem=jnp.zeros((m, n, n), dtype),
        y_mem=jnp.zeros((m, n, n), dtype),
        r_mem=jnp.zeros((m,), dtype),
        count=jnp.asarray(0, jnp.int32),
    )


def _opts(**kw):
    defaults = dict(
        density=Tanh(), ortho=True, extended=True, has_cov=True, m=7, ls_tries=10
    )
    defaults.update(kw)
    return CoreOptions(**defaults)


class TestLbfgsMemory:
    def test_push_and_fifo_eviction(self):
        """(lbfgs.rs:178-202) insert + FIFO eviction at capacity."""
        mem = _empty_memory(2, 2)
        true_flag = jnp.asarray(True)
        for i in range(5):
            s = jnp.full((2, 2), float(i + 1))
            y = jnp.ones((2, 2))
            mem = _push_memory(mem, s, y, jnp.asarray(1.0), true_flag)
        assert int(mem.count) == 2
        # Last two pushes survive, oldest first.
        assert float(mem.s_mem[0, 0, 0]) == 4.0
        assert float(mem.s_mem[1, 0, 0]) == 5.0

    def test_push_respects_flag(self):
        mem = _empty_memory(3, 2)
        mem = _push_memory(
            mem, jnp.ones((2, 2)), jnp.ones((2, 2)), jnp.asarray(1.0), jnp.asarray(False)
        )
        assert int(mem.count) == 0


class TestDirection:
    def test_empty_memory_ortho_is_preconditioned_gradient(self):
        """With no memory, direction = -skew(G / H) (lbfgs.rs:109-114)."""
        g = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
        h = jnp.full((2, 2), 2.0)
        mem = _empty_memory(7, 2)
        d = compute_direction(g, h, jnp.ones(2), mem, _opts(ortho=True))
        expected = -(g / 2.0)  # already skew
        np.testing.assert_allclose(np.asarray(d), np.asarray(expected), atol=1e-12)

    def test_two_loop_matches_dense_reference(self):
        """Two-loop recursion vs a plain NumPy implementation."""
        rng = np.random.default_rng(0)
        n, m_used = 3, 4
        g = rng.standard_normal((n, n))
        h = np.abs(rng.standard_normal((n, n))) + 1.0
        s_list = [rng.standard_normal((n, n)) for _ in range(m_used)]
        y_list = [rng.standard_normal((n, n)) for _ in range(m_used)]
        r_list = [1.0 / np.sum(s * y) for s, y in zip(s_list, y_list)]

        # NumPy mirror of lbfgs.rs:84-133 (ortho branch).
        q = g.copy()
        alphas = []
        for s, y, r in zip(reversed(s_list), reversed(y_list), reversed(r_list)):
            a = r * np.sum(s * q)
            alphas.append(a)
            q = q - a * y
        alphas.reverse()
        z = q / h
        z = (z - z.T) / 2
        for s, y, r, a in zip(s_list, y_list, r_list, alphas):
            b = r * np.sum(y * z)
            z = z + (a - b) * s
        expected = -z

        mem = _empty_memory(7, n)
        for s, y, r in zip(s_list, y_list, r_list):
            mem = _push_memory(
                mem, jnp.asarray(s), jnp.asarray(y), jnp.asarray(r), jnp.asarray(True)
            )
        d = compute_direction(
            jnp.asarray(g), jnp.asarray(h), jnp.ones(n), mem, _opts(ortho=True)
        )
        np.testing.assert_allclose(np.asarray(d), expected, atol=1e-10)


class TestHessianHelpers:
    def test_solve_hessian_system(self):
        """(lbfgs.rs:136-150) elementwise 2x2 solves."""
        rng = np.random.default_rng(1)
        n = 4
        h = rng.standard_normal((n, n)) + 3 * np.eye(n)
        h_off = np.abs(rng.standard_normal(n)) + 0.5
        g = rng.standard_normal((n, n))

        expected = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                det = h[i, j] * h[j, i] - h_off[i] * h_off[j]
                if abs(det) > 1e-15:
                    expected[i, j] = (h[j, i] * g[i, j] - h_off[i] * g[j, i]) / det

        out = solve_hessian_system(jnp.asarray(h), jnp.asarray(h_off), jnp.asarray(g))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    def test_regularize_hessian(self):
        """(lbfgs.rs:155-171) eigenvalue floor on off-diagonal entries."""
        rng = np.random.default_rng(2)
        n = 4
        h = rng.standard_normal((n, n))
        h_off = np.abs(rng.standard_normal(n)) + 0.1
        lam = 0.01

        # Reference semantics: row-major IN-PLACE scan — a later entry
        # (j, i) reads the already-bumped (i, j) (lbfgs.rs:155-171).
        expected = h.copy()
        for i in range(n):
            for j in range(n):
                if i != j:
                    diff = expected[i, j] - expected[j, i]
                    discr = np.sqrt(diff * diff + 4 * h_off[i] * h_off[j])
                    eig = 0.5 * (expected[i, j] + expected[j, i] - discr)
                    if eig < lam:
                        expected[i, j] += lam - eig

        out = regularize_hessian(jnp.asarray(h), jnp.asarray(h_off), lam)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)


class TestLossAndLineSearch:
    def test_loss_ortho_is_density_term_only(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 100)))
        w = jnp.asarray(rng.standard_normal((2, 2)))
        signs = jnp.ones(2)
        opts = _opts(ortho=True, extended=True)
        loss = compute_loss(w, x, signs, opts)
        expected = float(jnp.sum(jnp.mean(Tanh().log_lik(w @ x), axis=1)))
        assert float(loss) == pytest.approx(expected, rel=1e-12)

    def test_loss_nonortho_includes_logdet(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 100)))
        w = jnp.asarray([[2.0, 0.0], [0.0, 3.0]])
        signs = jnp.ones(2)
        opts = _opts(ortho=False, extended=False)
        loss = compute_loss(w, x, signs, opts)
        expected = -np.log(6.0) + float(
            jnp.sum(jnp.mean(Tanh().log_lik(w @ x), axis=1))
        )
        assert float(loss) == pytest.approx(expected, rel=1e-12)

    def test_loss_singular_w_is_penalty(self):
        """(core.rs:90-96) singular W -> 1e15."""
        x = jnp.ones((2, 10))
        w = jnp.zeros((2, 2))
        opts = _opts(ortho=False, extended=False)
        assert float(compute_loss(w, x, jnp.ones(2), opts)) >= 1e15

    def test_line_search_accepts_descent(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 500)) * 3)
        w = jnp.eye(2)
        opts = _opts(ortho=True, extended=False)
        loss0 = compute_loss(w, x, jnp.ones(2), opts)
        # A small skew rotation direction.
        direction = jnp.asarray([[0.0, 1e-3], [-1e-3, 0.0]])
        success, w_n, loss_n, step, _moments, _tries, _exp = line_search(
            x, w, direction, jnp.ones(2), loss0, jnp.asarray(10), opts
        )
        # Whatever alpha is accepted (or not), invariants hold:
        if bool(success):
            assert float(loss_n) < float(loss0)
        assert w_n.shape == w.shape

    def test_line_search_failure_semantics(self):
        """On failure: step uses alpha halved ls_tries times (core.rs:140-149)."""
        # All-zero data: rotations leave the loss exactly unchanged, so
        # the strict-decrease test fails at every alpha.
        x = jnp.zeros((2, 200))
        w = jnp.eye(2)
        opts = _opts(ortho=True, extended=False)
        success, _, _, step, _moments, _tries, _exp = line_search(
            x,
            w,
            jnp.asarray([[0.0, 1.0], [-1.0, 0.0]]),
            jnp.ones(2),
            jnp.asarray(0.0),
            jnp.asarray(4),
            opts,
        )
        assert not bool(success)
        np.testing.assert_allclose(
            np.asarray(step), np.asarray([[0.0, 2.0**-4], [-(2.0**-4), 0.0]]), atol=0
        )


class TestRunCore:
    def test_identity_input_converges_fast(self):
        """Already-independent whitened input: small gradient quickly."""
        rng = np.random.default_rng(7)
        u = rng.uniform(0.001, 0.999, size=(3, 4000))
        x = np.sign(rng.standard_normal((3, 4000))) * (-np.log(u))
        x -= x.mean(axis=1, keepdims=True)
        x /= x.std(axis=1, keepdims=True)
        res = run_core(
            jnp.asarray(x),
            jnp.eye(3),
            1e-4,
            0.01,
            200,
            _opts(ortho=True, extended=True, has_cov=True),
        )
        assert bool(res.converged)

    def test_max_iter_zero_like_cap(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((3, 1000)))
        res = run_core(x, jnp.eye(3), 1e-12, 0.01, 2, _opts())
        assert int(res.n_iterations) <= 2


def test_donated_entry_matches_plain_bitwise():
    """run_core_jit_donated + opts.donate_data (the solver's path: X
    donated, final Y rotated in place through X's buffer) must
    reproduce the non-donating entry EXACTLY — the blockwise rotation
    preserves each element's reduction order, so w, y, and every
    diagnostic are bit-identical."""
    from picard_ica_tpu.models.core import run_core_jit, run_core_jit_donated

    rng = np.random.default_rng(11)
    n, t = 6, 30_000
    s = rng.laplace(size=(n, t))
    x64 = rng.standard_normal((n, n)) @ s
    x64 -= x64.mean(axis=1, keepdims=True)
    cov = x64 @ x64.T / t
    w_eig, u = np.linalg.eigh(cov)
    k = (u / np.sqrt(w_eig)).T
    xw = jnp.asarray(k @ x64)

    base = run_core_jit(xw, jnp.eye(n, dtype=xw.dtype), 1e-7, 0.01, 50, _opts())
    donated = run_core_jit_donated(
        xw.copy(), jnp.eye(n, dtype=xw.dtype), 1e-7, 0.01, 50,
        _opts(donate_data=True),
    )
    assert int(base.n_iterations) == int(donated.n_iterations)
    assert np.array_equal(np.asarray(base.w), np.asarray(donated.w))
    assert np.array_equal(np.asarray(base.y), np.asarray(donated.y))
    assert float(base.gradient_norm) == float(donated.gradient_norm)
