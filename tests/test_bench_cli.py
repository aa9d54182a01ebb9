"""Smoke coverage for the headline bench deliverable (bench.py).

The round-2 lesson: bench.py rotted (cold-start regression) without
any test noticing until the driver's official run timed out. This
suite runs the full bench pipeline — on-device datagen, device
whiten, core measurement, CPU baseline, JSON emission — at toy scale
on the CPU backend, asserting the stdout contract the driver parses
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


def test_bench_rerun_reproduces_contract(bench, capsys):
    """A second in-process run must reproduce the contract — the bench
    holds NO disk state (round-3 lesson: disk caches a fresh clone
    cannot have are a cold-start trap, VERDICT r3 item 1)."""
    bench.main()
    first = _parse_stdout(capsys)

    bench._BEST.clear()
    bench.main()
    second = _parse_stdout(capsys)
    assert second["metric"] == first["metric"]
    assert second["value"] > 0


def test_bench_data_is_device_generated(bench, monkeypatch, capsys):
    """The critical path must not touch the host-side LCG generator:
    397 s of single-core datagen is what killed BENCH_r03 (VERDICT r3).
    The native module must not even be probed (its first-use g++ build
    cost ~90 s of that record)."""
    from picard_ica_tpu import native
    from picard_ica_tpu.utils import datagen

    def _boom(*a, **kw):  # pragma: no cover - assertion helper
        raise AssertionError("bench touched a host-scale datagen path")

    # (the n*n mixing block still comes from the host LCG — that is
    # 4096 values, not a data-scale stream, and stays allowed)
    monkeypatch.setattr(datagen, "generate_bench_data", _boom)
    monkeypatch.setattr(native, "available", _boom)
    bench.main()
    assert _parse_stdout(capsys)["value"] > 0


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
