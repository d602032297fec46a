"""Chunk-size sweep for the flat stencil kernel (pipeline-bubble probe).

The flat kernel (ops/spmm.py::stencil_flat_ext) runs at ~65-75% of the
measured stream roofline; the residual gap is 2 redundant shifted x reads
(~0.023 ms at n=148k) plus per-grid-step pipeline bubbles. Larger chunks
amortize the bubbles at the cost of VMEM. Honest scan-differential timing
(docs/PERFORMANCE.md round 3).

Run on the real chip: python examples/sweep_flat_chunk.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
from prealps_tpu.ops.spmm import (
    panel_to_lane_major,
    panel_to_flat_kmajor,
    stencil_blocks_flat,
    stencil_flat_chunk,
    stencil_flat_ext,
)


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    nel = int(os.environ.get("PREALPS_PROBE_NEL", "36"))
    t = int(os.environ.get("PREALPS_PROBE_T", "12"))
    from prealps_tpu.core.generators import elasticity3d

    a = elasticity3d(nel, nel, nel)
    n, nnz = a.shape[0], a.nnz
    st = csr_to_stencil_bsr_t(a, br=3, dtype=np.float32)
    bf = stencil_blocks_flat(st.blocks_t)
    halo = max(abs(o) for o in st.offsets)
    nrb = st.blocks_t.shape[3]
    rng = np.random.default_rng(0)
    xt = panel_to_lane_major(
        jnp.asarray(rng.standard_normal((n, t)).astype(np.float32)), 3)
    xf0 = panel_to_flat_kmajor(xt)

    def make_body(chunk):
        def body(xf):
            x_ext = jnp.concatenate(
                [xf[:, nrb - halo:], xf, xf[:, :halo]], axis=1)
            y = stencil_flat_ext(bf, st.offsets, x_ext, halo, br=3,
                                 chunk=chunk)
            return y / jnp.sqrt(jnp.mean(y * y) + 1.0)
        return body

    def timeit(body):
        @functools.partial(jax.jit, static_argnums=1)
        def many(z, k):
            z, _ = jax.lax.scan(lambda c, _: (body(c), None), z, None,
                                length=k)
            return z

        def run_len(k, z):
            z = many(z, k)
            z.block_until_ready()
            best = 1e9
            for _ in range(2):
                t0 = time.time()
                z = many(z, k)
                z.block_until_ready()
                best = min(best, time.time() - t0)
            return best, z

        t_short, z = run_len(40, xf0)
        t_long, _ = run_len(200, z)
        return max((t_long - t_short) / 160 * 1e3, 1e-6)

    default = stencil_flat_chunk(t, 3, len(st.offsets))
    print(f"n={n} nnz={nnz} nrb={nrb} default_chunk={default}", flush=True)
    for chunk in sorted({default, 1536, 1792, 2048, 2560, 4096}):
        try:
            ms = timeit(make_body(chunk))
            print(f"chunk={chunk:6d}: {ms:.4f} ms  "
                  f"({nnz / ms / 1e6:.1f} Gnnz/s)", flush=True)
        except Exception as e:
            print(f"chunk={chunk:6d}: FAILED {type(e).__name__}: {e}"[:200],
                  flush=True)


if __name__ == "__main__":
    main()
