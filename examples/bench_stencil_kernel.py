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

    from prealps_tpu.utils.timing import scan_differential_ms

    def timeit(fn, label):
        # honest timing: data-dependent in-dispatch chain, two lengths
        # differenced (docs/PERFORMANCE.md round 3 — the old independent-
        # dispatch loop gets elided by the remote runtime)
        y = fn(xt)
        y.block_until_ready()
        ms = scan_differential_ms(fn, xt, k_short=40, k_long=200)
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

    # sublane-dense FLAT kernel (the round-3 default on TPU)
    from prealps_tpu.ops.spmm import (
        panel_from_flat_kmajor,
        panel_to_flat_kmajor,
        stencil_blocks_flat,
        stencil_flat_chunk,
        stencil_flat_ext,
    )

    bf = stencil_blocks_flat(st.blocks_t)
    halo = max(abs(o) for o in st.offsets)
    nrb = st.blocks_t.shape[3]

    def f_flat(v):
        xf = panel_to_flat_kmajor(v)
        x_ext = jnp.concatenate([xf[:, nrb - halo:], xf, xf[:, :halo]],
                                axis=1)
        yf = stencil_flat_ext(bf, st.offsets, x_ext, halo, br=3,
                              chunk=stencil_flat_chunk(t, 3, len(st.offsets)))
        return panel_from_flat_kmajor(yf, 3)

    try:
        ms, y1 = timeit(jax.jit(f_flat), "flat (sublane-dense)")
        err = float(jnp.linalg.norm(y1 - y0) / jnp.linalg.norm(y0))
        print(f"  relerr vs xla: {err:.2e}", flush=True)
        impls["flat"] = ms
    except Exception as e:
        print(f"flat FAILED: {type(e).__name__}: {e}"[:300], flush=True)
    print(impls)


if __name__ == "__main__":
    main()
