#!/usr/bin/env python
"""Micro-benchmark: batched block-banded solve at LORASC-apply shapes.

The LORASC apply does three of these per ECG iteration (two interior, one
separator); this measures ms per solve vs the scan unroll factor on the
real chip. Shapes default to the n=148k/8-part benchmark (bs=1032, nblk=17).
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
    P = int(os.environ.get("BB_P", "8"))
    nblk = int(os.environ.get("BB_NBLK", "17"))
    bs = int(os.environ.get("BB_BS", "1032"))
    t = int(os.environ.get("BB_T", "12"))

    from prealps_tpu.direct.banded import (
        block_banded_cholesky,
        block_banded_solve,
    )

    # operands generated ON DEVICE: the remote-attach tunnel moves ~MB/s,
    # shipping GB-scale factors from host would dominate the benchmark
    @jax.jit
    def make():
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        g = jax.random.normal(k1, (P, nblk, bs, bs), jnp.float32) / bs
        d = jnp.einsum("pnik,pnjk->pnij", g, g) + 2.0 * jnp.eye(bs)
        e = jax.random.normal(k2, (P, nblk, bs, bs), jnp.float32) / bs
        e = e.at[:, 0].set(0.0)
        v = jax.random.normal(k3, (P, nblk, bs, t), jnp.float32)
        return d, e, v

    d, e, v = make()
    fac = block_banded_cholesky(d, e)
    jax.block_until_ready(fac.l_inv)
    gb = 4 * P * nblk * bs * bs * 4 / 1e9  # 2 factors x fwd+bwd passes

    for unroll in (1, True):
        fn = jax.jit(lambda x, u=unroll: block_banded_solve(fac, x, unroll=u))
        w = fn(v)
        w.block_until_ready()
        reps = 30
        t0 = time.time()
        for _ in range(reps):
            w = fn(w * 0.5)
        w.block_until_ready()
        ms = (time.time() - t0) / reps * 1e3
        print(f"unroll={unroll}: {ms:.3f} ms  ({gb/ms*1e3:.0f} GB/s effective)",
              flush=True)


if __name__ == "__main__":
    main()
