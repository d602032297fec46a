#!/usr/bin/env python
"""Weak-scaling sweep of the distributed ECG solve.

(BASELINE.md north star: ≥70% weak-scaling efficiency on nnz/s across a
v5e-16.) Grows the problem with the shard count (constant rows/shard) and
reports nnz/s per configuration. On a CPU host this exercises the virtual
8-device mesh (correctness + comm structure); on a real multi-chip slice the
same script measures true ICI scaling.

Usage: python examples/weak_scaling.py [--base-nel 8] [--shards 1,2,4,8]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-nel", type=int, default=8)
    ap.add_argument("--shards", default="1,2,4,8")
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--maxiter", type=int, default=60)
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-virtual-device CPU mesh (e.g. when "
                         "no TPU is attached)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    jax.config.update("jax_default_matmul_precision", "highest")

    from prealps_tpu.core.generators import elasticity3d
    from prealps_tpu.parallel.driver import DistributedECG
    from prealps_tpu.solvers import ECGOptions

    platform = jax.devices()[0].platform
    dtype = np.float32 if platform == "tpu" else np.float64
    rng = np.random.default_rng(0)

    base = None
    for nshards in (int(v) for v in args.shards.split(",")):
        # scale z-extent with the shard count: rows/shard constant
        nel_z = args.base_nel * nshards
        a = elasticity3d(args.base_nel, args.base_nel, nel_z)
        b = rng.standard_normal(a.shape[0])
        opts = ECGOptions(
            t=args.t, tol=1e-30, maxiter=args.maxiter,
            variant="odir_fused", layout="tbn", record_history=False,
        )
        solver = DistributedECG.build(
            a, nshards=nshards, opts=opts, precond="chebyshev",
            fmt="stencil", br=3, dtype=dtype, refine=False,
        )
        solver.solve(b)  # compile + warm
        t0 = time.time()
        _, info = solver.solve(b)
        dt = time.time() - t0
        nnz_s = a.nnz * info["iters"] / dt
        if base is None:
            base = nnz_s / nshards if nshards == 1 else nnz_s
        eff = nnz_s / (base * nshards)
        print(json.dumps({
            "nshards": nshards, "n": a.shape[0], "nnz": a.nnz,
            "iters": info["iters"], "wall_s": round(dt, 3),
            "gnnz_per_s": round(nnz_s / 1e9, 3),
            "weak_efficiency": round(eff, 3),
            "platform": platform,
        }))


if __name__ == "__main__":
    main()
