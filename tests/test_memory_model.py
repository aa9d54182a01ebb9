"""Pins the single-chip HBM peak model (utils/memory_model) to the
round-4 chip-measured buffer anatomy and max-T boundary, so a buffer-
structure change that would regress max-T shows up as arithmetic
instead of a silent on-chip OOM (VERDICT r4 item 7)."""

import pytest

from picard_ica_tpu.utils import memory_model as mm


def test_projection_is_the_binding_phase_at_bench_scale():
    """Chip-measured anatomy: the whitened copy materializes while the
    raw data is still alive — 2 full data buffers, more than datagen's
    in-place 1, the refine's 1+block, and the core's 1.5+partials."""
    phases = mm.phase_peak_bytes(256, 6_000_000)
    assert mm.binding_phase(256, 6_000_000) == "projection"
    assert phases["projection"] == 2 * 256 * 6_000_000 * 4  # 12.288e9
    # datagen mixes in place: 1 buffer + one rotation block
    assert phases["datagen"] < phases["projection"] * 0.60
    # core: donated f32 X + bf16 copy + grouped partials < 2 buffers
    assert phases["core"] < phases["projection"]


def test_max_t_reproduces_the_measured_boundary():
    """Round-4 chip facts: 256x6M fits in a fresh process, 256x7M does
    not. The model must reproduce that boundary exactly — and for ANY
    arena value inside the measured bracket, not just the committed
    midpoint (the bracket is the measurement; the midpoint is a
    convenience)."""
    assert mm.max_t(256) == 6_000_000
    for arena in (12.4e9, 13.0e9, 14.3e9):
        assert mm.max_t(256, arena_bytes=arena) == 6_000_000, arena


def test_peak_scales_linearly_in_t():
    assert mm.fit_peak_bytes(256, 4_000_000) == pytest.approx(
        mm.fit_peak_bytes(256, 2_000_000) * 2, rel=0.01
    )


def test_headline_shape_has_ample_headroom():
    """The 64x4M headline pipeline peaks ~2 GB — nowhere near the
    arena; memory pressure is a large-N concern only."""
    peak = mm.fit_peak_bytes(64, 4_000_000)
    assert peak == pytest.approx(2 * 64 * 4_000_000 * 4, rel=0.05)
    assert peak < 0.2 * mm.EFFECTIVE_ARENA_BYTES


def test_core_partials_term_tracks_grouping():
    """The grouped-partials fix is why the core phase stays under the
    projection peak: un-grouped partials at 256x6M would add ~GB-scale
    HBM (the round-4 OOM), grouped they stay ~hundreds of MB."""
    from picard_ica_tpu.ops import pallas_kernels as pk

    n, t = 256, 6_000_000
    bt = pk._tile_t(n, t)
    n_tiles = -(-t // bt)
    group = pk._partials_group(n_tiles, n, 2)
    assert group > 1  # grouping engages at this scale
    phases = mm.phase_peak_bytes(n, t)
    comp = n * t * 4
    partials = phases["core"] - comp - comp // 2
    ungrouped = n_tiles * (2 * n * n + 2 * n) * 4
    assert partials * (group - 0.5) < ungrouped  # ~group-fold smaller
    assert partials < 0.5e9


def test_xla_path_core_model():
    phases = mm.phase_peak_bytes(512, 1_000_000, use_pallas=False)
    comp = 512 * 1_000_000 * 4
    assert phases["core"] == comp + comp // 2 + comp
