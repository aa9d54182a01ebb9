"""Profiling helpers (SURVEY.md §5: the reference's only performance
tooling is criterion wall-clock benches; the TPU-native equivalents are
``jax.profiler`` device traces plus throughput summaries).

``profile_fit`` wraps a fit in a profiler trace viewable in
TensorBoard/XProf or parseable from the emitted ``*.trace.json.gz``.
``fit_with_timing`` reports the numbers BASELINE.md tracks: wall time,
iterations to tolerance, and grad-loop samples/s/chip.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import time
from typing import Optional

import jax

from ..config import PicardConfig
from ..solver import Picard


def profile_fit(x, config: Optional[PicardConfig] = None, mesh=None,
                trace_dir: str = "/tmp/picard_trace"):
    """Run ``Picard.fit`` under a jax.profiler trace; returns the result.

    The caller should have warmed the compile cache (run the same shapes
    once before) so the trace shows steady-state device time rather
    than compilation.
    """
    with jax.profiler.trace(trace_dir):
        result = Picard.fit(x, config, mesh=mesh)
        jax.block_until_ready(result.sources)
    return result


def device_trace_summary(trace_dir: str, device_substr: str = "TPU",
                         top_k: int = 12) -> dict:
    """Aggregate on-device op time from a ``jax.profiler.trace`` dump.

    Wall-clock timing of sub-ms launches is unreliable through this
    environment's TPU tunnel (``block_until_ready`` can return early),
    so every committed per-call device cost in DESIGN.md comes from
    profiler traces. This parses the newest
    ``plugins/profile/*/<host>.trace.json.gz`` under ``trace_dir``,
    keeps complete ("X") events on processes whose name contains
    ``device_substr`` (e.g. "/device:TPU:0"; pass "CPU" on the host
    backend), and returns::

        {"total_us": float,            # summed op duration
         "by_op":   {name: us, ...},  # per-op totals, descending
         "trace_path": str}

    XLA device tracks are hierarchical: the same device time appears
    once as an aggregate "XLA Modules" span AND again as the per-op
    "XLA Ops" spans inside it (measured on this backend's dumps: two
    threads under ``/device:TPU:0`` with identical totals), so summing
    every event on the pid would double-count. When a device pid has
    an "XLA Ops" thread, only that thread is counted; otherwise all of
    the pid's threads except "XLA Modules" are (the CPU backend's
    executor threads carry no aggregate track).

    ``total_us`` still over-counts if ops overlap on parallel op-level
    tracks; on a single TPU core the compute track is serial, so the
    sum is the device busy time.
    """
    dumps = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not dumps:
        raise FileNotFoundError(f"no trace dumps under {trace_dir}")
    path = dumps[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    device_pids = set()
    thread_names: dict = {}
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pname = str(ev.get("args", {}).get("name", ""))
            if device_substr.lower() in pname.lower():
                device_pids.add(ev.get("pid"))
        elif ev.get("name") == "thread_name":
            thread_names[(ev.get("pid"), ev.get("tid"))] = str(
                ev.get("args", {}).get("name", ""))

    op_pids = {pid for (pid, _), name in thread_names.items()
               if pid in device_pids and name == "XLA Ops"}

    def _counted(ev) -> bool:
        pid = ev.get("pid")
        if pid not in device_pids:
            return False
        name = thread_names.get((pid, ev.get("tid")), "")
        if pid in op_pids:
            return name == "XLA Ops"
        # "python" is the host-side caller track (wall spans incl.
        # dispatch waits), present when the matched pid is /host:CPU.
        return name not in ("XLA Modules", "python")

    by_op: dict = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or not _counted(ev):
            continue
        dur = float(ev.get("dur", 0.0))
        total += dur
        name = ev.get("name", "?")
        by_op[name] = by_op.get(name, 0.0) + dur
    by_op = dict(sorted(by_op.items(), key=lambda kv: -kv[1])[:top_k])
    return {"total_us": total, "by_op": by_op, "trace_path": path}


def fit_with_timing(x, config: Optional[PicardConfig] = None, mesh=None,
                    reps: int = 3) -> dict:
    """Fit ``reps`` times (after one warm-up) and report throughput.

    Returns a dict with the fitted result plus ``wall_s`` (best of
    reps), ``iterations``, ``samples_per_s`` (T * iterations / wall —
    the grad-loop rate BASELINE.md's headline metric uses, attributing
    the whole wall time to the optimizer loop, i.e. a lower bound) and
    ``samples_per_s_per_chip``.
    """
    result = Picard.fit(x, config, mesh=mesh)
    jax.block_until_ready(result.sources)

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = Picard.fit(x, config, mesh=mesh)
        jax.block_until_ready(result.sources)
        best = min(best, time.perf_counter() - t0)

    t = x.shape[1]
    n_chips = mesh.devices.size if mesh is not None else 1
    sps = t * max(result.n_iterations, 1) / best
    return {
        "result": result,
        "wall_s": best,
        "iterations": result.n_iterations,
        "converged": result.converged,
        "samples_per_s": sps,
        "samples_per_s_per_chip": sps / n_chips,
        "n_chips": n_chips,
    }
