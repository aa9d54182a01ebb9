"""Streaming-W large-N kernels vs the resident-W kernels / dense XLA
(interpret mode on CPU).

The streaming kernels (ops/pallas_kernels.streaming_fused_sums /
streaming_loglik_sums) lift the fused path's N cap past the resident-W
kernels' VMEM boundary (reference handles any N through BLAS GEMM,
core.rs:218,274); they must be numerically interchangeable with the
resident kernels the rest of the suite already validates.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from picard_ica_tpu.models.core import CoreOptions, run_core
from picard_ica_tpu.ops import pallas_kernels as pk
from picard_ica_tpu.ops.densities import Cube, Exp, Tanh
from picard_ica_tpu.ops.pallas_kernels import (
    max_fused_n,
    max_streaming_n,
    rotated_fused_sums,
    rotated_loglik_sums,
    rotated_moments_sums,
    streaming_fused_sums,
    streaming_loglik_sums,
)


def _mats(n, t, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    m_old = jnp.asarray(rng.standard_normal((n, n)) * scale)
    m_new = m_old + jnp.asarray(rng.standard_normal((n, n)) * 0.01)
    x = jnp.asarray(rng.standard_normal((n, t)))
    return m_new, m_old, x


@pytest.mark.parametrize("density", [Tanh(), Exp(0.5), Cube()], ids=str)
@pytest.mark.parametrize("shape", [(40, 1000), (200, 777)])  # 1 and 2 W blocks
def test_streaming_fused_delta_matches_resident(density, shape):
    n, t = shape
    m_new, m_old, x = _mats(n, t)
    ref = rotated_fused_sums(m_new, m_old, x, density, True, True,
                             interpret=True)
    out = streaming_fused_sums(m_new, m_old, x, density, True, True,
                               interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12)


def test_streaming_fused_plain_matches_resident():
    n, t = 150, 513  # partial tile + partial W block
    m_new, m_old, x = _mats(n, t, seed=3)
    ref = rotated_fused_sums(m_new, m_old, x, Tanh(), True, True,
                             interpret=True, absolute_ll=True)
    out = streaming_fused_sums(m_new, m_old, x, Tanh(), True, True,
                               interpret=True, absolute_ll=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12)


def test_streaming_fused_flags_off():
    """need_h / need_ysq off: dummies stay zero and nothing leaks."""
    n, t = 40, 300
    m_new, m_old, x = _mats(n, t, seed=4)
    ref = rotated_fused_sums(m_new, m_old, x, Tanh(), False, False,
                             interpret=True)
    out = streaming_fused_sums(m_new, m_old, x, Tanh(), False, False,
                               interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12)
    assert not np.any(np.asarray(out[4]))  # h dummy
    assert not np.any(np.asarray(out[5]))  # ysq dummy


def test_streaming_group_accumulation(monkeypatch):
    """Multiple G/H accumulation groups (group boundary re-zeros the
    VMEM accumulator; partials fold pairwise outside)."""
    monkeypatch.setattr(pk, "_STREAM_GROUP", 2)
    n, t = 40, 9001  # bt=2048 -> 5 tiles -> 3 groups of <=2
    m_new, m_old, x = _mats(n, t, seed=5)
    ref = rotated_fused_sums(m_new, m_old, x, Tanh(), True, True,
                             interpret=True)
    out = streaming_fused_sums(m_new, m_old, x, Tanh(), True, True,
                               interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12)


def test_dispatch_above_resident_cap():
    """The public wrappers route N > max_fused_n to the streaming
    kernels transparently (same jitted signature, same outputs)."""
    n = max_fused_n(absolute_ll=True) + 8  # 584: beyond every resident cap
    t = 300
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((n, n)) * 0.05)
    x = jnp.asarray(rng.standard_normal((n, t)))

    g, pm, h, ysq = rotated_moments_sums(w, x, Tanh(), True, True,
                                         interpret=True)
    y = np.asarray(w) @ np.asarray(x)
    psi = np.tanh(y)
    psi_d = 1.0 - psi * psi
    np.testing.assert_allclose(np.asarray(g), psi @ y.T, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pm), psi_d.sum(axis=1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(h), psi_d @ (y * y).T,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ysq), (y * y).sum(axis=1),
                               rtol=1e-9)

    ll, ysq2 = rotated_loglik_sums(w, x, Tanh(), True, interpret=True)
    ll_ref = np.asarray(Tanh().log_lik(jnp.asarray(y))).sum(axis=1)
    np.testing.assert_allclose(np.asarray(ll), ll_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ysq2), (y * y).sum(axis=1),
                               rtol=1e-9)

    m_old = jnp.asarray(np.eye(n) + rng.standard_normal((n, n)) * 0.01)
    m_new = m_old + jnp.asarray(rng.standard_normal((n, n)) * 0.005)
    out = streaming_fused_sums(m_new, m_old, x, Tanh(), True, True,
                               interpret=True)
    via_wrapper = rotated_fused_sums(m_new, m_old, x, Tanh(), True, True,
                                     interpret=True)
    for a, b in zip(out, via_wrapper):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_core_loop_streaming_vs_xla(monkeypatch):
    """Force the streaming dispatch at a small N and run the whole
    optimizer: trajectory must match the XLA path at f64."""
    monkeypatch.setattr(pk, "max_fused_n", lambda absolute_ll=False: 4)
    n, t = 9, 2111  # unique shape: avoids any unpatched jit-cache entry
    rng = np.random.default_rng(7)
    s = rng.laplace(size=(n, t))
    a = rng.standard_normal((n, n))
    x = a @ s
    x = jnp.asarray(x - x.mean(axis=1, keepdims=True))
    cov = jnp.asarray(np.cov(np.asarray(x)))

    def run(use_pallas):
        # ortho mode: trajectories stay in per-iteration lockstep
        # (non-ortho's in-place Hessian regularization amplifies
        # reduction-order ULPs — see tests/test_native.py's bounded
        # fork), so the streaming-vs-XLA comparison can stay tight.
        opts = CoreOptions(
            density=Tanh(), ortho=True, extended=True, has_cov=True,
            ls_tries=10, m=7, use_pallas=use_pallas,
            kernel_precision="f32",
        )
        return run_core(jnp.asarray(x), cov, 1e-7, 0.01, 12, opts)

    r_stream = run(True)
    r_xla = run(False)
    np.testing.assert_allclose(np.asarray(r_stream.w), np.asarray(r_xla.w),
                               rtol=1e-9, atol=1e-9)
    assert int(r_stream.n_iterations) == int(r_xla.n_iterations)


def test_stream_caps():
    """The VMEM model's caps: ortho (G only) reaches N=1024+; the cap
    is honest (one block over must raise)."""
    cap_h = max_streaming_n(need_h=True)
    cap_g = max_streaming_n(need_h=False)
    assert cap_h >= 768
    assert cap_g >= 1024
    assert cap_g > cap_h
    bt, _ = pk._stream_dims(cap_g, need_h=False, absolute_ll=False)
    assert bt >= 128
    bt_over, _ = pk._stream_dims(cap_g + 128, need_h=False,
                                 absolute_ll=False)
    assert bt_over < 128


def test_streaming_accepts_bf16_x():
    """bf16 X through the streaming kernel: the f32-precision request
    coerces to the single-pass bf16 matmul (Mosaic rejects HIGHEST on
    bf16 operands), outputs stay f32, values match to bf16 rounding."""
    n, t = 40, 700
    rng = np.random.default_rng(12)
    m_old = jnp.asarray(np.eye(n, dtype=np.float32))
    m_new = m_old + jnp.asarray(
        0.05 * rng.standard_normal((n, n)).astype(np.float32))
    x32 = jnp.asarray(rng.standard_normal((n, t)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)

    # Plain mode IS the production bf16 tier (cheap-tier plain accepts);
    # compare values there, where no small-delta amplification applies.
    out32 = streaming_fused_sums(m_new, m_old, x32, Tanh(), True, True,
                                 interpret=True, precision="bf16",
                                 absolute_ll=True)
    out16 = streaming_fused_sums(m_new, m_old, x16, Tanh(), True, True,
                                 interpret=True, precision="f32",  # coerced
                                 absolute_ll=True)
    for a, b in zip(out32, out16):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2)
    # Delta mode with bf16 X: the coercion must hold there too (no
    # HIGHEST-on-bf16 request); values are dominated by the bf16
    # rounding of X itself, so only finiteness is asserted.
    out_delta = streaming_fused_sums(m_new, m_old, x16, Tanh(), True, True,
                                     interpret=True, precision="f32")
    for b in out_delta:
        assert b.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(b)))


def test_sharded_streaming_matches_single(monkeypatch, eight_device_mesh):
    """The streaming kernels inside the shard_map sample-sharding path
    (multi-chip fused step) == single device, on the 8-device CPU
    mesh."""
    monkeypatch.setattr(pk, "max_fused_n", lambda absolute_ll=False: 4)
    from picard_ica_tpu import Picard, PicardConfig
    from picard_ica_tpu.utils import generate_test_data

    _, a, x = generate_test_data(6, 4800, 21)  # unique shape (jit cache)
    cfg = PicardConfig(random_state=5, use_pallas=True, tol=1e-6)
    r_single = Picard.fit(x, cfg)
    r_mesh = Picard.fit(x, cfg, mesh=eight_device_mesh)
    assert r_mesh.converged
    np.testing.assert_allclose(
        np.asarray(r_single.unmixing), np.asarray(r_mesh.unmixing), atol=1e-5
    )

def test_partials_budget_routes_to_streaming(monkeypatch):
    """Below the N cap but above the per-tile-partials HBM budget the
    wrappers must reroute to the streaming kernels: at N=512/T=4M the
    resident fused kernel's (n_tiles, N, N) partials alone are ~10 GB
    (review finding; the budget caps total partial bytes). Verified by
    shrinking the budget so a small shape crosses it, then checking
    the two routes agree."""
    n, t = 48, 1152  # unique shape: avoids any unpatched jit-cache entry
    rng = np.random.default_rng(12)
    m_old = jnp.asarray(np.eye(n) + 0.01 * rng.standard_normal((n, n)))
    m_new = jnp.asarray(np.asarray(m_old) + 0.02 * rng.standard_normal((n, n)))
    x = jnp.asarray(rng.standard_normal((n, t)))

    # One (N, N) f32 partial is ~9 KB; force the budget below a single
    # tile's partial so the wrapper MUST stream (patched BEFORE the
    # first trace of this shape — the dispatch is a trace-time branch).
    monkeypatch.setattr(pk, "_RESIDENT_PARTIALS_MAX", 1024)
    calls = []
    real_stream = pk.streaming_fused_sums

    def spy(*a, **k):
        calls.append(1)
        return real_stream(*a, **k)

    monkeypatch.setattr(pk, "streaming_fused_sums", spy)
    routed = pk.rotated_fused_sums(m_new, m_old, x, Tanh(), True, True,
                                   interpret=True)
    assert calls, "partials budget did not reroute to streaming"
    direct = real_stream(m_new, m_old, x, Tanh(), True, True,
                         interpret=True)
    for a, b in zip(direct, routed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
