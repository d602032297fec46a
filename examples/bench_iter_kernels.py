#!/usr/bin/env python
"""Per-iteration kernel cost breakdown on the real chip, measured honestly.

Repeated same-argument dispatches through the remote-attach tunnel can be
served from caches (measured: a 600 MB-read einsum "timed" at 17 us), so
each kernel is timed as a CHAIN of K dependent applications inside ONE jit
(fori_loop y <- f(y)) — nothing can be elided, and dispatch latency
amortises away. Records the numbers behind docs/PERFORMANCE.md's
per-iteration model of the headline ECG solve.
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
    K = int(os.environ.get("PREALPS_PROBE_K", "100"))
    mbn = int(os.environ.get("PREALPS_PROBE_MBN", "336"))

    import math

    import scipy.sparse as sp

    from prealps_tpu.core.generators import elasticity3d
    from prealps_tpu.core.layout import (
        contiguous_row_layout,
        permute_and_pad_matrix,
    )
    from prealps_tpu.direct.device_bj import (
        bj_apply_lane_major,
        build_device_block_jacobi,
    )
    from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
    from prealps_tpu.ops.spmm import (
        stencil_bsr_spmm_t_pallas_bs,
        stencil_scan_accumulate,
    )

    cache = f"/tmp/prealps_ela_{nel}_0.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                          shape=tuple(d["shape"]))
    else:
        a = elasticity3d(nel, nel, nel, heterogeneous=False)
    br = 3
    mult = math.lcm(8, br, mbn * br)
    layout = contiguous_row_layout(a.shape[0], 1, row_multiple=mult)
    a_pad = permute_and_pad_matrix(a, layout)
    st = csr_to_stencil_bsr_t(a_pad, br=br, dtype=np.float32)
    nrb = st.blocks_t.shape[-1]
    n, nnz = a.shape[0], a.nnz
    print(f"n={n} nnz={nnz} nrb={nrb} S={st.blocks_t.shape[0]} K={K}",
          file=sys.stderr, flush=True)

    inv5 = jax.jit(build_device_block_jacobi,
                   static_argnames=("mbn", "method"))(
        st.blocks_t, st.offsets, mbn=mbn, method="chol")
    inv5.block_until_ready()
    rng = np.random.default_rng(0)
    z0 = jnp.asarray(rng.standard_normal((t, br, nrb)).astype(np.float32))

    def timed_chain(f, label, flops=None, bytes_=None, ops=()):
        """ms per application of f, from a K-deep dependent chain.

        Large operands must come through `ops` (jit arguments), NOT a
        closure: closed-over arrays become jaxpr constants and blow the
        remote compile service's request-size limit (HTTP 413)."""
        @jax.jit
        def chain(v, *ops_):
            # normalise each step so the chain can't over/underflow
            def body(_, vv):
                y = f(vv, *ops_)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, K, body, v)

        y = chain(z0, *ops)
        y.block_until_ready()
        t0 = time.perf_counter()
        y = chain(z0, *ops)
        y.block_until_ready()
        ms = (time.perf_counter() - t0) / K * 1e3
        extra = ""
        if bytes_:
            extra += f"  {bytes_/ms/1e6:.0f} GB/s"
        if flops:
            extra += f"  {flops/ms/1e9:.2f} TFLOP/s"
        print(f"{label}: {ms:.3f} ms{extra}", flush=True)
        return ms

    halo = max(abs(o) for o in st.offsets)
    sp_bytes = st.blocks_t.size * 4 + 2 * z0.size * 4

    def spmm_pallas(v):
        return stencil_bsr_spmm_t_pallas_bs(st, v, chunk=1536)

    def spmm_unrolled(v):
        x_ext = jnp.concatenate(
            [v[:, :, nrb - halo:], v, v[:, :, :halo]], axis=2)
        os.environ["PREALPS_STENCIL_IMPL"] = "unrolled"
        return stencil_scan_accumulate(st.blocks_t, st.offsets, x_ext, halo)

    timed_chain(spmm_pallas, "spmm pallas_bs c1536",
                flops=2 * nnz * t, bytes_=sp_bytes)
    timed_chain(spmm_unrolled, "spmm xla unrolled",
                flops=2 * nnz * t, bytes_=sp_bytes)

    bj_bytes = inv5.size * 4 + 2 * z0.size * 4
    bj_flops = 2 * inv5.shape[0] * (br * mbn) ** 2 * t
    timed_chain(lambda v, iv: bj_apply_lane_major(iv, v), "bj_apply f32",
                flops=bj_flops, bytes_=bj_bytes, ops=(inv5,))

    from prealps_tpu.direct.device_bj import bj_apply_pallas, pack_bj_dense

    b2 = jax.jit(pack_bj_dense)(inv5)
    b2.block_until_ready()
    rts = [int(x) for x in
           os.environ.get("PREALPS_PROBE_BJ_RT", "128").split(",")]
    for rt in rts:
        timed_chain(lambda v, bb, rt=rt: bj_apply_pallas(bb, v, br=br, rt=rt),
                    f"bj_apply pallas rt{rt}", flops=bj_flops,
                    bytes_=b2.size * 4 + 2 * z0.size * 4, ops=(b2,))

    inv5_bf = inv5.astype(jnp.bfloat16)

    def bj_bf16(v, iv):
        # native bf16 MXU pass (f32 accumulate): both operands bf16 so the
        # 300 MB factor read is NOT materialised back to f32 first
        nb = iv.shape[0]
        zb = v.reshape(t, br, nb, mbn).transpose(0, 2, 1, 3)
        w = jnp.einsum("bmrks,tbks->tbmr", iv, zb.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return w.transpose(0, 2, 1, 3).reshape(t, br, nb * mbn)

    timed_chain(bj_bf16, "bj_apply bf16 native",
                flops=bj_flops, bytes_=bj_bytes // 2 + z0.size * 8,
                ops=(inv5_bf,))


if __name__ == "__main__":
    main()
