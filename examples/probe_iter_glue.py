#!/usr/bin/env python
"""Measure the all-inclusive per-iteration cost of the headline ECG solve
(difference of two fixed-iteration runs — subtracts dispatch/setup), plus
the grouped-BJ apply alone, to locate the residual per-iteration 'glue'
(docs/PERFORMANCE.md per-iteration model)."""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import scipy.sparse as sp

    from prealps_tpu.parallel.driver import DistributedECG
    from prealps_tpu.solvers import ECGOptions

    nel = int(os.environ.get("PREALPS_PROBE_NEL", "36"))
    t = int(os.environ.get("PREALPS_PROBE_T", "12"))
    bjs = int(os.environ.get("PREALPS_PROBE_BJ", "240"))
    dedupe = bool(int(os.environ.get("PREALPS_PROBE_DEDUPE", "1")))
    cache = f"/tmp/prealps_ela_{nel}_0.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                          shape=tuple(d["shape"]))
    else:
        from prealps_tpu.core.generators import elasticity3d

        a = elasticity3d(nel, nel, nel, heterogeneous=False)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.shape[0])

    def run(maxiter):
        opts = ECGOptions(t=t, tol=1e-30, maxiter=maxiter,
                          variant="odir_fused", layout="tbn",
                          record_history=True)
        solver = DistributedECG.build(
            a, nshards=1, opts=opts, precond="block_jacobi",
            dtype=np.float32, fmt="stencil", br=3, refine=False,
            block_size=bjs, grid=(nel + 1, nel + 1, nel) if dedupe else None,
            bj_dedupe=dedupe)
        from prealps_tpu.core.layout import pad_to_padded

        def put(vec):
            b_pad = pad_to_padded(solver.layout, vec.astype(np.float32))
            b_pad = np.ascontiguousarray(b_pad.reshape(-1, solver._br).T)
            return jax.device_put(jnp.asarray(b_pad))

        # EVERY dispatch gets a never-before-seen rhs: same-argument
        # dispatches are served from a result cache through the remote
        # tunnel (even across processes), which fakes ~0 ms runs
        res = solver._solve_fn(put(rng.standard_normal(a.shape[0])),
                               *solver._operands)       # compile+warm
        np.asarray(res.res)   # block_until_ready does not reliably wait
                              # through the remote tunnel — materialise
        times = []
        for _ in range(3):
            bd = put(rng.standard_normal(a.shape[0]))
            t0 = time.perf_counter()
            res = solver._solve_fn(bd, *solver._operands)
            np.asarray(res.res)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        print(f"maxiter={maxiter}: {dt:.4f}s (all {[f'{x:.4f}' for x in times]})"
              f" iters={int(res.iters)}", file=sys.stderr, flush=True)
        return dt

    m1 = int(os.environ.get("PREALPS_PROBE_M1", "100"))
    m2 = int(os.environ.get("PREALPS_PROBE_M2", "300"))
    t1, t2 = run(m1), run(m2)
    per_iter = (t2 - t1) / (m2 - m1) * 1e3
    print(f"per-iteration (all-inclusive): {per_iter:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
