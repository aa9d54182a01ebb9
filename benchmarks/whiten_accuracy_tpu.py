"""On-chip accuracy validation of the large-N device whitening path.

VERDICT r3 item 4: the round-3 grouped-accumulator Pallas covariance
(ops/pallas_kernels._grouped_covariance) extends the accurate
(chunked/pairwise) covariance past the per-tile kernels' N=512 cap,
but had never compiled on the real TPU. This harness measures, at the
exact scale of the committed 16%-rotation exhibit (docs/DESIGN.md §9,
N=600 x T=1M Laplace mixture):

  * relative covariance error of the device path vs host f64,
  * the whitening-matrix rotation ||K_dev - K_f64|| / ||K_f64||,
  * the same two numbers for the single-f32-dot fallback (the error
    model the AccuracyWarning describes),
  * device time per covariance pass,

and smoke-compiles the grouped kernel at the VMEM-model boundary
(N = max_pallas_cov_n()) so the routing threshold is chip-verified,
not just analytic. Reference anchor: whitening.rs:61-90 is all-f64 —
parity means not silently losing digits at EEG-scale N.

Usage:
    python benchmarks/whiten_accuracy_tpu.py [--json OUT] [--skip-boundary]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--t", type=int, default=1_000_000)
    ap.add_argument("--skip-boundary", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_suite"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from picard_ica_tpu.ops.pallas_kernels import (
        covariance_sums,
        max_pallas_cov_n,
    )
    from picard_ica_tpu.ops.whitening import whitening_matrix_from_covariance

    n, t = args.n, args.t
    _log(f"backend: {jax.default_backend()}; devices: {jax.devices()}")
    record: dict = {"n": n, "t": t, "backend": jax.default_backend()}

    # The DESIGN §9 exhibit's generator: host Laplace mixture, centered.
    t0 = time.time()
    rng = np.random.default_rng(0)
    s = rng.laplace(size=(n, t))
    x64 = rng.standard_normal((n, n)) @ s
    del s
    x64 -= x64.mean(axis=1, keepdims=True)
    x32 = x64.astype(np.float32)
    _log(f"host datagen done in {time.time() - t0:.0f}s")

    t0 = time.time()
    cov64 = x64 @ x64.T
    k64, _ = whitening_matrix_from_covariance(cov64, t, n)
    _log(f"host f64 covariance + K done in {time.time() - t0:.0f}s")
    cov_norm = np.linalg.norm(cov64)
    k_norm = np.linalg.norm(k64)

    eigs = np.linalg.eigvalsh(cov64)
    rel_gap = np.min(np.diff(eigs) / eigs[1:])
    record["min_relative_eigengap"] = float(rel_gap)
    _log(f"min relative eigengap: {rel_gap:.2e}")

    # The f32-INPUT floor: the exact (f64-accumulated) covariance of
    # the f32-cast data. No f32-input device path can beat this K —
    # the cast itself already perturbs C by ~1e-7 relative, and the
    # eigengap amplifies that into K. Any kernel matching this floor
    # is done; chasing "rotation < 1e-4 vs the f64 pipeline" at a
    # 2.8e-4 eigengap would require f64 *input*, which is what
    # whiten_precision='f64' is for.
    t0 = time.time()
    cov_cast = x32.astype(np.float64) @ x32.astype(np.float64).T
    k_cast, _ = whitening_matrix_from_covariance(cov_cast, t, n)
    floor_rot = float(np.linalg.norm(k_cast - k64) / k_norm)
    record["f32cast_floor_k_rotation"] = floor_rot
    _log(f"f32-cast floor: exact-f64-of-x32 K rotation {floor_rot:.2e} "
         f"(in {time.time() - t0:.0f}s)")

    xd = jnp.asarray(x32)

    def _metrics(cov_dev, label: str) -> dict:
        cov = np.asarray(cov_dev, np.float64)
        out = {"rel_cov_err": float(np.linalg.norm(cov - cov64) / cov_norm)}
        k, min_sv = whitening_matrix_from_covariance(cov, t, n)
        if k is None:
            out.update(k_rotation=None, k_rotation_vs_floor=None,
                       whiten_residual=None, rank_test="FAILED")
            _log(f"{label}: rel cov err {out['rel_cov_err']:.2e}; "
                 f"RANK TEST FAILED (min_sv={min_sv:.2e}) — K unusable")
            return out
        out["k_rotation"] = float(np.linalg.norm(k - k64) / k_norm)
        out["k_rotation_vs_floor"] = float(
            np.linalg.norm(k - k_cast) / k_norm)
        # Functional test: does K whiten the TRUE covariance? (Any
        # rotation within a near-degenerate eigenspace is absorbed by
        # the downstream W; whiteness is what the core loop assumes.)
        resid = k @ (cov64 / t) @ k.T - np.eye(n)
        out["whiten_residual_max"] = float(np.abs(resid).max())
        out["rank_test"] = "ok"
        _log(f"{label}: rel cov err {out['rel_cov_err']:.2e}, "
             f"K rotation {out['k_rotation']:.2e} "
             f"(vs f32-cast floor {out['k_rotation_vs_floor']:.2e}), "
             f"whiten residual {out['whiten_residual_max']:.2e}")
        return out

    # Device grouped-Pallas path (what _cov_impl_for routes for this N).
    t0 = time.time()
    cov_pallas = covariance_sums(xd)
    jax.block_until_ready(cov_pallas)
    np.asarray(cov_pallas[:1, :1])
    record["pallas_compile_run_s"] = time.time() - t0
    _log(f"grouped pallas covariance compile+run in "
         f"{record['pallas_compile_run_s']:.1f}s")
    record["pallas"] = _metrics(cov_pallas, "grouped pallas")

    # Single-f32-dot fallback (the AccuracyWarning's error model).
    dot = jax.jit(lambda x: jnp.dot(x, x.T,
                                    precision=jax.lax.Precision.HIGHEST))
    cov_dot = dot(xd)
    jax.block_until_ready(cov_dot)
    record["singledot"] = _metrics(cov_dot, "single f32 dot")

    # The SHIPPING device path: first-pass grouped covariance +
    # one-step iterative re-whitening (ops/whitening._refine_whitening).
    from picard_ica_tpu.ops.whitening import center_whiten

    t0 = time.time()
    x1, _, kd = center_whiten(xd, n, centering=False)
    np.asarray(x1[:1, :1])
    k_dev = np.asarray(kd, np.float64)
    resid = float(np.abs(k_dev @ (cov64 / t) @ k_dev.T - np.eye(n)).max())
    record["refined_path"] = {
        "wall_s": time.time() - t0,
        "whiten_residual_max": resid,
        "k_rotation": float(np.linalg.norm(k_dev - k64) / k_norm),
    }
    _log(f"refined device path: whiten residual {resid:.2e} "
         f"(K rotation {record['refined_path']['k_rotation']:.2e}, "
         f"wall {record['refined_path']['wall_s']:.1f}s incl. compiles)")

    if not args.skip_boundary:
        # VMEM-boundary smoke: the model's max N must actually compile
        # and run on the chip (tiny T keeps this cheap).
        nb = max_pallas_cov_n()
        t_small = 65_536
        xb = jnp.asarray(
            rng.standard_normal((nb, t_small)).astype(np.float32))
        t0 = time.time()
        covb = covariance_sums(xb)
        jax.block_until_ready(covb)
        ref = np.asarray(xb, np.float64)
        relb = float(np.linalg.norm(np.asarray(covb, np.float64) - ref @ ref.T)
                     / np.linalg.norm(ref @ ref.T))
        record["boundary_n"] = nb
        record["boundary_rel_cov_err"] = relb
        _log(f"boundary N={nb} x {t_small}: compiled+ran in "
             f"{time.time() - t0:.1f}s, rel cov err {relb:.2e}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=2)
    else:
        json.dump(record, sys.stdout, indent=2)
        print()


if __name__ == "__main__":
    main()
