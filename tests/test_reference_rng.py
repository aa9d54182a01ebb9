"""Reference-matched RNG stream (utils/reference_rng + native/src/rng.cpp).

The stream reproduces the reference's random W-init source
(solver.rs:57-60, 112-120: StdRng::seed_from_u64 -> ChaCha12 ->
rand_distr StandardNormal). No Rust toolchain exists here, so the
verification is layered (see the module docstring): the ChaCha core
against the RFC 8439 vector, the ziggurat tables against their
defining area invariant, and the pure-Python twin against the
independent C++ twin bit-for-bit.
"""

import math

import numpy as np
import pytest

from picard_ica_tpu import Picard, PicardConfig, native
from picard_ica_tpu.utils import reference_rng as rr

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_chacha_core_rfc8439():
    """Quarter round, word order and serialization vs RFC 8439 §2.3.2
    (ChaCha20; the 12-round variant shares everything but the loop
    count)."""
    kw = np.frombuffer(bytes(range(32)), dtype="<u4")
    blk = rr._chacha_blocks(
        kw, 1, 1, rounds=20, ietf_words=(0x09000000, 0x4A000000, 0x00000000)
    )
    expected = bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4"
        "c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2"
        "b5129cd1de164eb9cbd083e8a2503c4e"
    )
    assert blk.astype("<u4").tobytes() == expected


def test_ziggurat_tables_area_invariant():
    """Every strip of the 256-strip ziggurat must have area V — the
    defining property of the (R, V) pair; it fails loudly if either
    constant or the recurrence drifts."""
    X, F = rr.ZIG_NORM_X, rr.ZIG_NORM_F
    for i in range(1, 256):
        assert X[i] * (F[i + 1] - F[i]) == pytest.approx(rr._ZIG_V, abs=1e-11)
    tail = math.sqrt(math.pi / 2) * math.erfc(rr._ZIG_R / math.sqrt(2))
    assert X[1] * F[1] + tail == pytest.approx(rr._ZIG_V, abs=1e-13)
    assert X[0] == pytest.approx(rr._ZIG_V / F[1], rel=1e-15)
    assert X[256] == 0.0


def test_python_cpp_u64_stream_bit_exact():
    cs = native.reference_u64_stream(42, 128)
    rng = rr.StdRng(42)
    ps = np.array([rng.next_u64() for _ in range(128)], dtype=np.uint64)
    assert (cs == ps).all()


def test_python_cpp_normals_bit_exact_including_tail():
    """20k samples cover the wedge-rejection and (statistically
    certainly) several i==0 tail events; the two independent
    implementations must agree bit-for-bit through all branches."""
    n = 20_000
    mat_c = native.reference_normal_matrix(123, 1, n)[0]
    rng = rr.StdRng(123)
    mat_p = np.array([rr.standard_normal(rng) for _ in range(n)])
    assert (mat_c == mat_p).all()
    # The tail branch actually ran (P ~ 2.6e-4 per sample).
    assert (np.abs(mat_c) > rr._ZIG_R).sum() >= 1


def test_normal_statistics():
    x = native.reference_normal_matrix(7, 400, 500).ravel()
    assert abs(x.mean()) < 5e-3
    assert abs(x.std() - 1.0) < 5e-3
    assert abs((x**4).mean() - 3.0) < 0.1  # normal kurtosis
    assert abs(x).max() < 6.0


def test_seed_expansion_changes_every_word():
    """seed_from_u64 must decorrelate adjacent seeds (the PCG32
    expansion's whole point for low-Hamming-weight inputs)."""
    s0 = np.frombuffer(rr.seed_from_u64(0), dtype="<u4")
    s1 = np.frombuffer(rr.seed_from_u64(1), dtype="<u4")
    assert (s0 != s1).all()


def test_solver_random_init_reproducible_and_reference_stream():
    """fit(random_state=s) must consume exactly the reference stream:
    the drawn W equals sym_decorrelation(normal_matrix(s)) and repeat
    fits are bit-identical."""
    t = 2_000
    rng = np.random.default_rng(0)
    s = np.stack([rng.laplace(size=t), rng.uniform(-1, 1, size=t),
                  np.sign(rng.normal(size=t))])
    a = rng.normal(size=(3, 3))
    x = a @ s

    cfg = PicardConfig(random_state=42, max_iter=30)
    r1 = Picard.fit(x, cfg)
    r2 = Picard.fit(x, cfg)
    np.testing.assert_array_equal(np.asarray(r1.unmixing), np.asarray(r2.unmixing))

    # Different seed -> different draw -> (generically) different W.
    r3 = Picard.fit(x, PicardConfig(random_state=43, max_iter=30))
    assert not np.array_equal(np.asarray(r1.unmixing), np.asarray(r3.unmixing))

    # The stream the solver consumed IS normal_matrix(seed, k, k).
    draw = rr.normal_matrix(42, 3, 3)
    assert draw.shape == (3, 3)
    # (Indirect check: a fit given w_init=sym_decorr(draw) must follow
    # the same trajectory as the random_state=42 fit.)
    from picard_ica_tpu.ops.linalg import sym_decorrelation_with_mineig

    w0, _ = sym_decorrelation_with_mineig(np.asarray(draw))
    r4 = Picard.fit(x, PicardConfig(w_init=np.asarray(w0), max_iter=30))
    np.testing.assert_allclose(
        np.asarray(r1.unmixing), np.asarray(r4.unmixing), rtol=0, atol=0
    )


def test_pure_python_fallback_matches_native():
    """normal_matrix prefers the C++ path; the pure-Python fallback
    (exercised directly here) must produce the identical matrix."""
    rng = rr.StdRng(99)
    py = np.array([rr.standard_normal(rng) for _ in range(64)]).reshape(8, 8)
    assert (rr.normal_matrix(99, 8, 8) == py).all()


def test_chacha12_estream_zero_key_keystream():
    """The 12-round core against the published eSTREAM/djb ChaCha12
    test vector (256-bit all-zero key, all-zero IV) — the same vector
    rand_chacha's own test suite pins its ChaCha12 implementation to.
    This is the evidence the RFC 8439 test (20 rounds, IETF layout)
    cannot give: the exact round count StdRng uses, the djb 64-bit
    counter/nonce layout, and the counter increment (block 1)."""
    kw = np.zeros(8, dtype=np.uint32)
    stream = rr._chacha_blocks(kw, 0, 2, rounds=12).astype("<u4").tobytes()
    assert stream[:32].hex() == (
        "9bf49a6a0755f953811fce125f2683d5"
        "0429c3bb49e074147e0089a52eae155f"
    )
    assert stream[64:80].hex() == "0bd58841203e74fe86fc71338ce0173d"
    # ChaCha8 / ChaCha20 from the same parametric core: pins that the
    # `rounds` knob is genuinely double-rounds/2 and not off by one.
    b8 = rr._chacha_blocks(kw, 0, 1, rounds=8).astype("<u4").tobytes()
    assert b8[:16].hex() == "3e00ef2f895f40d67f5bb8e81f09a5a1"
    b20 = rr._chacha_blocks(kw, 0, 1, rounds=20).astype("<u4").tobytes()
    assert b20[:16].hex() == "76b8e0ada0f13d90405d6ae55386bd28"


# Frozen stream goldens: the composed seed_from_u64 -> ChaCha12 ->
# ziggurat pipeline for three seeds, captured from the (bit-agreeing)
# Python and C++ twins. They pin the COMPOSITION — word order at the
# u64 join, buffer refill boundaries, table indexing — so any future
# "cleanup" that silently shifts the stream fails loudly here.
_GOLDEN_U64 = {
    0: (0xBB2A3FB2CD2C6F7F, 0xC6017C948E27697B, 0x069DC102CF310A16),
    42: (0x86CC7763222724A2, 0x8AF00A133FAD517D, 0xA2EF6071DE5134D1),
    123456789: (0xFB55B38845AAEAF1, 0x58F8532561F1F85B, 0x3D13E8C6CB4D4795),
}


def test_stream_goldens_u64():
    for seed, expected in _GOLDEN_U64.items():
        rng = rr.StdRng(seed)
        got = tuple(rng.next_u64() for _ in range(3))
        assert got == expected, (seed, tuple(hex(v) for v in got))


def test_stream_goldens_normals():
    rng = rr.StdRng(42)
    got = np.array([rr.standard_normal(rng) for _ in range(4)])
    expected = np.array([
        0.06942791836196335, 0.13293812199412544,
        0.2625763573739537, -0.22530087839099155,
    ])
    assert (got == expected).all(), got.tolist()
