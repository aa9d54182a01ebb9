"""HLO evidence for the psum/compute overlap question (BASELINE north
star: moment psums should overlap the next score-kernel evaluation,
not serialize the line-search accept path).

Dumps the optimized HLO of one sharded core step on a virtual 8-device
CPU mesh and reports:
  * how many all-reduce ops the hot loop body contains,
  * whether the scalar accept-path reduction (dll) shares an
    all-reduce with the (N, N) moment reductions (XLA's all-reduce
    combiner merges small all-reduces by default — a merged op forces
    the moments reduction to complete before the accept branch),
  * the byte sizes involved.

Usage: python benchmarks/hlo_overlap.py [--pallas]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true",
                    help="inspect the Pallas (shard_map) path instead of GSPMD")
    ap.add_argument("--dump", default=None, help="write full HLO text here")
    args = ap.parse_args()

    from picard_ica_tpu.models.core import CoreOptions, run_core
    from picard_ica_tpu.ops.densities import Tanh
    from picard_ica_tpu.parallel.mesh import sample_mesh
    from picard_ica_tpu.solver import _data_sharding

    mesh = sample_mesh()
    sharding = _data_sharding(mesh)
    n, t = 16, 16384
    x = jnp.asarray(np.random.default_rng(0).laplace(size=(n, t)),
                    jnp.float32)
    x = jax.device_put(x, sharding)
    cov = jnp.eye(n, dtype=jnp.float32)

    opts = CoreOptions(
        density=Tanh(), ortho=True, extended=True, has_cov=True, m=7,
        ls_tries=10, use_pallas=args.pallas, data_sharding=sharding,
        kernel_precision="f32",
    )

    fn = jax.jit(
        lambda x_, c_: run_core(x_, c_, 1e-7, 0.01, 50, opts)
    )
    lowered = fn.lower(x, cov)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
        print(f"wrote {args.dump} ({len(hlo)} bytes)", file=sys.stderr)

    # All all-reduce ops (sync or async start/done pairs).
    ars = re.findall(r"^\s*(%?[\w.-]+) = ([^\n]*all-reduce[^\n]*)$", hlo,
                     re.M)
    print(f"path: {'pallas/shard_map' if args.pallas else 'gspmd'}")
    print(f"total all-reduce HLO ops: {len(ars)}")
    for name, line in ars:
        shapes = re.findall(r"f32\[([\d,]*)\]", line)
        kind = "start" if "all-reduce-start" in line else (
            "done" if "all-reduce-done" in line else "sync")
        print(f"  {name}: {kind:5s} shapes={shapes}")

    # Which all-reduces carry more than one tensor (combined)?
    combined = [(n_, l) for n_, l in ars if l.count("f32[") > 2]
    print(f"combined (multi-operand) all-reduces: {len(combined)}")


if __name__ == "__main__":
    main()
