#!/usr/bin/env python
"""Validate bf16 banded-factor storage on the full het-LORASC solve.

Builds the bench het configuration ONCE (f32 factors), solves 3×, then
swaps the banded factors to bf16 (same preconditioner otherwise) and
solves 3× — isolating the factor-storage effect on iterations and TTS.
"""
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[probe {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main():
    os.environ.setdefault("PREALPS_STENCIL_IMPL", "pallas")
    os.environ["PREALPS_FACTOR_STORE"] = "f32"   # baseline build
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import scipy.sparse as sp

    nel = int(os.environ.get("PREALPS_PROBE_NEL", "36"))
    cache = f"/tmp/prealps_ela_{nel}_1.npz"
    d = np.load(cache)
    a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                      shape=tuple(d["shape"]))

    from prealps_tpu.parallel.lorasc_stencil import StencilLorascECG
    from prealps_tpu.solvers import ECGOptions

    opts = ECGOptions(t=12, tol=1e-5, maxiter=3000, variant="omin",
                      layout="tbn")
    t0 = time.time()
    solver = StencilLorascECG.build(
        a, nparts=8, br=3, grid=(nel + 1, nel + 1, nel), opts=opts,
        dtype=np.float32, max_deflation=256, inner_tol=1e-3,
        correction="deflate")
    log(f"build {time.time()-t0:.0f}s deflated={solver.precond.deflated} "
        f"timings={solver.precond.timings}")

    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.shape[0])

    def run(tag):
        x, info = solver.solve(b)   # warm/compile
        runs = []
        for _ in range(3):
            t1 = time.time()
            x, info = solver.solve(b)
            runs.append((round(time.time() - t1, 3), info["iters"]))
        relres = float(np.linalg.norm(b - a @ x) / np.linalg.norm(b))
        print(f"{tag}: runs={runs} relres={relres:.3e} "
              f"rounds={info.get('refine_rounds')} "
              f"relres_scaled={info.get('relres_scaled'):.3e}", flush=True)

    run("f32 factors")

    ops_bf = dict(solver.precond.operands)
    for k in ("aii_linv", "aii_moff", "agg_linv", "agg_moff"):
        ops_bf[k] = ops_bf[k].astype(jnp.bfloat16)
    solver._m_ops = ops_bf
    run("bf16 factors")
    return 0


if __name__ == "__main__":
    sys.exit(main())
