"""Fit-level roofline columns (benchmarks/suite._roofline_fracs).

VERDICT r2 item 4 asked for an MFU/roofline column on fit-level rows;
these tests pin the GEMM-pass accounting so a schedule or kernel
change that invalidates the model shows up as a test failure, not a
silently wrong committed fraction.
"""

import numpy as np
import pytest

import jax


@pytest.fixture()
def suite(monkeypatch):
    import benchmarks.suite as suite_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    return suite_mod


class _Res:
    def __init__(self, stage_ls_calls):
        self.stage_ls_calls = np.asarray(stage_ls_calls)


def _opts(suite, **kw):
    from picard_ica_tpu.models.core import CoreOptions
    from picard_ica_tpu.ops.densities import Tanh

    base = dict(density=Tanh(), ortho=True, extended=True, has_cov=True,
                m=7, ls_tries=10, use_pallas=True, kernel_precision="auto")
    base.update(kw)
    return CoreOptions(**base)


def test_roofline_fracs_known_value(suite):
    """Hand-computed: ortho pallas auto-schedule, cumulative ls calls
    [10, 14, 15] -> per-stage [10, 4, 1]; bf16 stage is plain (2 GEMMs,
    1 bf16 pass), bf16x3 delta (3 GEMMs, 3 passes), final f32 delta
    (3 GEMMs, 6 passes)."""
    from benchmarks.roofline import HBM_BYTES_PER_S, PEAK_BF16

    n, t = 64, 1_000_000
    rec = {"wall_s": 0.01, "device_s": None}
    opts = _opts(suite)
    suite._roofline_fracs(rec, _Res([10, 14, 15]), opts, n, t)

    gemm = 2.0 * n * n * t
    flops = 10 * 2 * gemm * 1 + 4 * 3 * gemm * 3 + 1 * 3 * gemm * 6
    xbytes = 10 * 2.0 * n * t + (4 + 1) * 4.0 * n * t
    assert rec["mxu_frac_of_bf16_peak"] == pytest.approx(
        flops / 0.01 / PEAK_BF16)
    assert rec["hbm_frac_of_peak"] == pytest.approx(
        xbytes / 0.01 / HBM_BYTES_PER_S)


def test_roofline_fracs_prefers_device_time(suite):
    rec = {"wall_s": 1.0, "device_s": 0.5}
    suite._roofline_fracs(rec, _Res([4]), _opts(
        suite, kernel_precision="f32"), 32, 100_000)
    rec2 = {"wall_s": 1.0}
    suite._roofline_fracs(rec2, _Res([4]), _opts(
        suite, kernel_precision="f32"), 32, 100_000)
    assert rec["mxu_frac_of_bf16_peak"] == pytest.approx(
        2 * rec2["mxu_frac_of_bf16_peak"])


def test_roofline_fracs_skips_cpu_backend(suite, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    rec = {"wall_s": 0.01}
    suite._roofline_fracs(rec, _Res([10, 14, 15]), _opts(suite), 64, 10_000)
    assert "mxu_frac_of_bf16_peak" not in rec


_COLD_STDERR = """\
[bench +    0.0s] enabling persistent compilation cache
[bench +   10.2s] chip-acquire: devices [TpuDevice(id=0)]
[bench +   10.4s] chip-acquire: done in 0.2s
[bench +   10.4s] seed-datagen: generating 64x1000000 Laplace mixture on device
[bench +   22.0s] seed-datagen: done in 11.6s
[bench +   24.3s] seed-center+whiten done in 2.3s
[bench +   40.0s] seed-core compile+warm run done in 15.7s (30 iters, ...)
[bench +   40.3s] seed-rep 0: 2.900e+08 samples/s (30 iters, 0.10s)
[bench +   40.3s] seed measurement: 2.900e+08 samples/s (30 iters at T=1000000)
[bench +   40.3s] datagen: generating 64x4000000 Laplace mixture on device
[bench +   42.2s] datagen: done in 1.9s
[bench +   48.5s] center+whiten done in 6.3s
[bench +   59.6s] core compile+warm run done in 11.1s (35 iters, ...)
"""


def test_parse_cold_phases(suite):
    """The seed run's 'seed-' prefixed lines must NOT satisfy the
    full-run phase patterns (the pattern anchors right after the
    timestamp stamp) — otherwise a skipped full run would go
    unnoticed."""
    ends = suite._parse_cold_phases(_COLD_STDERR)
    assert ends == {"acquire": pytest.approx(10.4),
                    "seed": pytest.approx(40.3),
                    "datagen": pytest.approx(42.2),
                    "whiten": pytest.approx(48.5),
                    "core": pytest.approx(59.6)}


def test_parse_cold_phases_seed_only_leaves_full_run_none(suite):
    """A budget-shrunk run that never reaches the full config leaves
    the full-run phases None — cold_check then fails them as missing
    forensics, which is correct: a healthy cold run must complete the
    full pipeline."""
    seed_only = "".join(
        l + "\n" for l in _COLD_STDERR.splitlines()
        if "] seed" in l or "chip-acquire" in l or "cache" in l)
    ends = suite._parse_cold_phases(seed_only)
    assert ends["seed"] == pytest.approx(40.3)
    assert ends["datagen"] is None
    assert ends["whiten"] is None
    assert ends["core"] is None


def test_parse_cold_phases_missing_forensics(suite):
    ends = suite._parse_cold_phases("no bench lines at all")
    assert ends == {"acquire": None, "seed": None, "datagen": None,
                    "whiten": None, "core": None}


_FALLBACK_STDERR = """\
[bench +    0.0s] enabling persistent compilation cache
[bench +    9.3s] devices: [TpuDevice(id=0)]
[bench +    9.3s] datagen: generating 64x4000000 Laplace mixture on device
[bench +   11.0s] datagen: done in 1.7s
[bench +   17.2s] center+whiten done in 6.2s
[bench +   80.0s] core compile/run failed (InternalError: Mosaic ...)
[bench +   80.1s] retrying once with _TANH_NATIVE_DELTA=False (exp-form delta)
[bench +  190.4s] core compile+warm run done in 181.1s (36 iters, ...)
"""


def test_parse_cold_phases_fallback_retry(suite):
    """The Mosaic-fallback 'core compile/run failed' line also starts
    with the token 'core'; the phase end must come from the retry's
    done-line so a budget-busting failed-attempt+recompile can't slip
    past cold_check."""
    ends = suite._parse_cold_phases(_FALLBACK_STDERR)
    assert ends["core"] == pytest.approx(190.4)


# ---------------------------------------------------------------------------
# The max-T capability ladder (suite._maxt_ladder): OOM rungs step down,
# a success stops the ladder, a real bug surfaces, all-OOM leaves an
# explicit failed record (VERDICT r4 / ADVICE r4 semantics).
# ---------------------------------------------------------------------------


class _Proc:
    def __init__(self, returncode, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def _core_kw():
    from picard_ica_tpu.ops.densities import Tanh

    return dict(density=Tanh(), ortho=True, extended=True, has_cov=True,
                m=7, ls_tries=10, use_pallas=True, kernel_precision="auto")


def _run_ladder(suite, monkeypatch, procs):
    import subprocess

    calls = []

    def fake_run(cmd, **kw):
        calls.append(int(cmd[-2]))  # the T argument
        return procs[len(calls) - 1]

    monkeypatch.setattr(subprocess, "run", fake_run)
    records = []
    suite._maxt_ladder(records, _core_kw())
    return records, calls


def test_maxt_ladder_steps_down_on_oom_and_stops_on_success(suite, monkeypatch):
    import json as _json

    ok = _json.dumps({"n": 256, "t": 5_000_000, "samples_per_s": 5e7,
                      "iters": 50, "converged": True, "gradient_norm": 1e-8,
                      "wall_s": 5.0, "stage_ls_calls": [50, 80, 100]})
    records, calls = _run_ladder(
        suite, monkeypatch, [_Proc(3), _Proc(0, stdout=ok), _Proc(0)])
    assert calls == [6_000_000, 5_000_000]  # stopped after the success
    assert len(records) == 1
    rec = records[0]
    assert rec["group"] == "baseline_5_max_t_single_chip"
    assert rec["t"] == 5_000_000 and rec["iters"] == 50
    # the roofline shim consumed stage_ls_calls into MFU columns
    assert "stage_ls_calls" not in rec
    assert "mxu_frac_of_bf16_peak" in rec


def test_maxt_ladder_all_oom_leaves_failed_record(suite, monkeypatch):
    records, calls = _run_ladder(
        suite, monkeypatch, [_Proc(3), _Proc(3), _Proc(3)])
    assert calls == [6_000_000, 5_000_000, 4_000_000]
    assert len(records) == 1
    assert records[0]["failed"] is True
    assert "OOM" in records[0]["reason"]


def test_maxt_ladder_real_bug_surfaces(suite, monkeypatch):
    with pytest.raises(RuntimeError, match="maxt_row 256x6000000"):
        _run_ladder(suite, monkeypatch,
                    [_Proc(1, stderr="Traceback ... ValueError")])
