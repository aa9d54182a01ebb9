"""Smoke coverage for the headline bench deliverable (bench.py).

The round-2 lesson: bench.py rotted (cold-start regression) without
any test noticing until the driver's official run timed out. This
suite runs the full bench pipeline — datagen cache, whiten cache,
core measurement, CPU baseline, JSON emission — at toy scale on the
CPU backend, asserting the stdout contract the driver parses
(exactly one JSON line with the four required keys; reference
harness contract: benches/benchmarks.rs:130-141).
"""

import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    """bench.py module shrunk to toy scale, caches redirected to tmp."""
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "N_COMPONENTS", 8)
    monkeypatch.setattr(bench_mod, "N_SAMPLES", 20_000)
    monkeypatch.setattr(bench_mod, "REPS", 1)
    # Keep conftest's .jax_cache_tests compilation cache (the real
    # bench would repoint it at .jax_cache, clobbering the TPU cache
    # with CPU executables).
    monkeypatch.setattr(bench_mod, "_enable_compilation_cache", lambda: None)
    # Redirect .bench_cache/ writes into the test sandbox.
    monkeypatch.setattr(bench_mod, "_REPO", str(tmp_path))
    bench_mod._BEST.clear()
    bench_mod._EMITTED = False
    return bench_mod


def _parse_stdout(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one stdout line, got {out}"
    return json.loads(out[0])


def test_bench_emits_driver_contract(bench, capsys):
    bench.main()
    rec = _parse_stdout(capsys)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "grad_loop_samples_per_sec_per_chip"
    assert rec["unit"] == "samples/s/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0


def test_bench_whitened_cache_roundtrip(bench, capsys):
    """Second run must hit the whitened-data cache and reproduce the
    contract (the cold-start path the driver actually exercises)."""
    import pathlib

    bench.main()
    first = _parse_stdout(capsys)
    cache = [p.name for p in
             pathlib.Path(bench._REPO).glob(".bench_cache/*.npy")]
    assert f"whitened_{bench.N_COMPONENTS}x{bench.N_SAMPLES}_s42.f32.npy" in cache

    bench._BEST.clear()
    bench.main()
    second = _parse_stdout(capsys)
    assert second["metric"] == first["metric"]
    assert second["value"] > 0


def test_bench_falls_back_when_core_compile_fails(bench, capsys, monkeypatch):
    """A Mosaic rejection of the tanh-native delta form must not kill
    the headline artifact: the first failed compile flips
    _TANH_NATIVE_DELTA off, clears the jit caches, and retries once
    (bench.py:_tpu_samples_per_sec)."""
    import picard_ica_tpu.models.core as core_mod
    from picard_ica_tpu.ops import densities

    monkeypatch.setattr(densities, "_TANH_NATIVE_DELTA", True)
    real = core_mod.run_core_jit
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("Mosaic failed to lower tanh (simulated)")
        return real(*a, **kw)

    monkeypatch.setattr(core_mod, "run_core_jit", flaky)
    bench.main()
    rec = _parse_stdout(capsys)
    assert rec["value"] > 0
    assert calls["n"] >= 2
    assert densities._TANH_NATIVE_DELTA is False


def test_bench_sigterm_emits_best_so_far(bench, capsys):
    """The driver-timeout path: once _BEST holds a measurement, the
    SIGTERM handler must print the JSON record (bench.py:_on_term
    calls os._exit, so invoke _emit directly here)."""
    bench._BEST.update(sps=1.23e8, iters=30, cpu_sps=2.4e6)
    bench._emit()
    rec = _parse_stdout(capsys)
    assert rec["value"] == pytest.approx(1.23e8)
    assert rec["vs_baseline"] == pytest.approx(1.23e8 / 2.4e6)
