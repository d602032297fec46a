#!/usr/bin/env python
"""Micro-benchmark: lane-major stencil SpMM implementations on the real chip.

Measures the unrolled-XLA path vs the BlockSpec Pallas kernel on the
headline operator (n≈148k elasticity). Records ms + Gnnz/s for
docs/PERFORMANCE.md.
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    nel = int(os.environ.get("PREALPS_PROBE_NEL", "36"))
    t = int(os.environ.get("PREALPS_PROBE_T", "12"))

    import scipy.sparse as sp

    from prealps_tpu.core.generators import elasticity3d
    from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
    from prealps_tpu.ops.spmm import (
        panel_to_lane_major,
        stencil_bsr_spmm_t,
        stencil_bsr_spmm_t_pallas_bs,
    )

    cache = f"/tmp/prealps_ela_{nel}_0.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                          shape=tuple(d["shape"]))
    else:
        a = elasticity3d(nel, nel, nel, heterogeneous=False)
    n, nnz = a.shape[0], a.nnz
    st = csr_to_stencil_bsr_t(a, br=3, dtype=np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, t)).astype(np.float32)
    xt = panel_to_lane_major(jnp.asarray(x), 3)

    def timeit(fn, label):
        y = fn(xt)
        y.block_until_ready()
        reps = 50
        t0 = time.time()
        for _ in range(reps):
            y = fn(xt)
        y.block_until_ready()
        ms = (time.time() - t0) / reps * 1e3
        print(f"{label}: {ms:.3f} ms  ({nnz/ms/1e6:.1f} Gnnz/s)", flush=True)
        return ms, y

    impls = {}
    os.environ["PREALPS_STENCIL_IMPL"] = "unrolled"
    f_unrolled = jax.jit(lambda v: stencil_bsr_spmm_t(st, v))
    impls["xla_unrolled"], y0 = timeit(f_unrolled, "xla_unrolled")

    for chunk in (1536, 2048, 3072, 4096, 6144):
        try:
            f_pl = jax.jit(
                lambda v, c=chunk: stencil_bsr_spmm_t_pallas_bs(st, v, chunk=c)
            )
            ms, y1 = timeit(f_pl, f"pallas_bs chunk={chunk}")
            err = float(jnp.linalg.norm(y1 - y0) / jnp.linalg.norm(y0))
            print(f"  relerr vs xla: {err:.2e}", flush=True)
            impls[f"pallas_{chunk}"] = ms
        except Exception as e:
            print(f"pallas_bs chunk={chunk} FAILED: {type(e).__name__}: {e}"[:300],
                  flush=True)
    print(impls)


if __name__ == "__main__":
    main()
