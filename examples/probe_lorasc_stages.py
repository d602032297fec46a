#!/usr/bin/env python
"""Staged TPU probe: isolate which LORASC-solve kernel faults the worker.

Stages: 1) build  2) jitted lorasc_apply alone at t=12  3) capped ECG solve.
Not part of the test suite.
"""

import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[stage {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    nel = int(os.environ.get("PREALPS_PROBE_NEL", "36"))
    defl = int(os.environ.get("PREALPS_PROBE_DEFL", "128"))
    t = int(os.environ.get("PREALPS_PROBE_T", "12"))
    maxiter = int(os.environ.get("PREALPS_PROBE_MAXITER", "60"))
    os.environ.setdefault("PREALPS_STENCIL_IMPL", "pallas")
    dtype = np.float32 if on_tpu else np.float64

    from prealps_tpu.core.generators import elasticity3d
    from prealps_tpu.core.scaling import sym_rac_scaling
    from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
    from prealps_tpu.ops.spmm import stencil_bsr_spmm_t
    from prealps_tpu.precond.lorasc_scale import build_scalable_lorasc, lorasc_apply
    from prealps_tpu.solvers.ecg import ECGOptions, ecg_solve

    import scipy.sparse as sp

    t0 = time.time()
    cache = f"/tmp/prealps_ela_{nel}_1.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=tuple(d["shape"]))
    else:
        a = elasticity3d(nel, nel, nel, heterogeneous=True)
        a = sp.csr_matrix(a)
        np.savez(cache, data=a.data, indices=a.indices, indptr=a.indptr,
                 shape=np.array(a.shape))
    log(f"matrix n={a.shape[0]} nnz={a.nnz} ({time.time()-t0:.0f}s)")

    a_s, scale_d = sym_rac_scaling(a)
    a_t = csr_to_stencil_bsr_t(a_s, br=3, dtype=dtype)

    t0 = time.time()
    pre = build_scalable_lorasc(
        a_s, nparts=8, br=3, grid=(nel + 1, nel + 1, nel),
        max_deflation=defl, dtype=dtype, a_stencil=a_t,
    )
    plan = pre.plan
    log(f"stage1 build ok {time.time()-t0:.0f}s deflated={pre.deflated} "
        f"bs_i={plan.bs_i} nblk_i={plan.nblk_i} bs_g={plan.bs_g}")

    # stage 2: preconditioner apply alone, t-wide
    nrb = plan.nrb
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((t, 3, nrb)).astype(dtype))
    app = jax.jit(lambda ops, rr: lorasc_apply(plan, ops, rr))
    t0 = time.time()
    z = app(pre.operands, r)
    z.block_until_ready()
    log(f"stage2 apply#1 ok {time.time()-t0:.0f}s |z|={float(jnp.linalg.norm(z)):.3e}")
    t0 = time.time()
    for i in range(5):
        z = app(pre.operands, z)
    z.block_until_ready()
    log(f"stage2 apply x5 ok {time.time()-t0:.1f}s |z|={float(jnp.linalg.norm(z)):.3e}")

    # stage 3: capped ECG solve with the preconditioner
    opts = ECGOptions(t=t, tol=1e-3, maxiter=maxiter, layout="tbn",
                      variant="odir_fused")
    n = a_s.shape[0]
    grow = (np.arange(nrb)[None, :] * 3 + np.arange(3)[:, None])
    assign = jnp.asarray(((grow * t) // n).astype(np.int32))
    b = rng.standard_normal(n)
    b_lane = jnp.asarray(
        np.ascontiguousarray(b.astype(dtype).reshape(nrb, 3).T))

    def run(bb, ops):
        a_apply = lambda x: stencil_bsr_spmm_t(ops["a_stencil"], x)
        m_apply = lambda rr: lorasc_apply(plan, ops, rr)
        return ecg_solve(a_apply, m_apply, bb, opts, split_assign=assign)

    fn = jax.jit(run)
    t0 = time.time()
    res = fn(b_lane, pre.operands)
    it = int(res.iters)
    log(f"stage3 ecg ok {time.time()-t0:.0f}s iters={it} res={float(res.res):.3e}")
    print("ALL STAGES OK")


if __name__ == "__main__":
    main()
