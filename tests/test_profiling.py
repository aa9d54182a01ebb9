"""Profiling utilities (utils/profiling.py).

The committed per-call device costs in DESIGN.md and the large-N
roofline evidence (benchmarks/large_n_trace.py) all flow through
``device_trace_summary`` — wall clock is unreliable through the TPU
tunnel, so the parser is the measurement path and needs its own
coverage. Exercised here against a real jax.profiler dump on the CPU
backend (same chrome-trace schema as the TPU dumps).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picard_ica_tpu.utils.profiling import device_trace_summary, fit_with_timing


def test_device_trace_summary_parses_cpu_trace(tmp_path):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((128, 128)))
    f = jax.jit(lambda a: jnp.tanh(a @ a.T).sum())
    jax.block_until_ready(f(x))  # compile outside the trace
    with jax.profiler.trace(str(tmp_path)):
        jax.block_until_ready(f(x))
    s = device_trace_summary(str(tmp_path), device_substr="CPU")
    assert s["total_us"] > 0.0
    assert s["by_op"]  # at least one aggregated op
    assert all(v > 0 for v in s["by_op"].values())
    # per-op totals are a partition of the total (truncation to top_k
    # can only drop mass, never add it)
    assert sum(s["by_op"].values()) <= s["total_us"] + 1e-6


def test_device_trace_summary_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        device_trace_summary(str(tmp_path / "nope"))


def test_device_trace_summary_skips_module_aggregate_track(tmp_path):
    """TPU dumps put the SAME device time on two threads of the device
    pid — an aggregate 'XLA Modules' span and the per-op 'XLA Ops'
    spans inside it (measured on this backend). The parser must count
    the op track only, not 2x the device time. Synthetic fixture in
    the exact chrome-trace schema of a real dump."""
    import gzip
    import json
    import os

    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 701, "tid": 9, "name": "thread_name",
         "args": {"name": "python"}},
        # One 100us module span enclosing two op spans of 60+40us.
        {"ph": "X", "pid": 3, "tid": 1, "name": "jit_f", "ts": 0,
         "dur": 100.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.1", "ts": 0,
         "dur": 60.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "dot.2", "ts": 60,
         "dur": 40.0},
        # Host-side wall span that must never count as device time.
        {"ph": "X", "pid": 701, "tid": 9, "name": "jit_f", "ts": 0,
         "dur": 5000.0},
    ]
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    s = device_trace_summary(str(tmp_path), device_substr="TPU")
    assert s["total_us"] == pytest.approx(100.0)
    assert s["by_op"] == {"fusion.1": pytest.approx(60.0),
                          "dot.2": pytest.approx(40.0)}


def test_fit_with_timing_reports_throughput():
    from picard_ica_tpu import PicardConfig
    from picard_ica_tpu.utils import generate_test_data

    _, _, x = generate_test_data(4, 20_000, 3)
    out = fit_with_timing(x, PicardConfig(random_state=0, tol=1e-5), reps=1)
    assert out["converged"]
    assert out["samples_per_s"] > 0
    assert out["n_chips"] == 1
