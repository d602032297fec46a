#!/usr/bin/env python
"""SpMM format sweep — the analog of the reference's SpMM benchmark driver
(reference: examples/test_bench_spmm.c sweeps t = 1..28 with 10 repetitions
against PETSc MatMatMult).

Sweeps the enlarging factor t over the available device formats and reports
Gnnz/s per configuration as JSON lines. Runs on whatever backend jax sees
(TPU when available, CPU otherwise).

Usage: python examples/bench_spmm.py [--nel 16] [--t 1,4,8,12,16] [--reps 20]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nel", type=int, default=16)
    ap.add_argument("--t", default="1,4,8,12,16")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--formats", default="stencil_t,stencil_t_pallas,ell,dia,dia_tbn")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from prealps_tpu.core.generators import elasticity3d
    from prealps_tpu.core.scaling import sym_rac_scaling
    from prealps_tpu.ops.formats import (
        csr_to_ell,
        csr_to_stencil_bsr_t,
    )
    from prealps_tpu.ops.spmm import (
        dia_ell_spmm,
        ell_spmm,
        stencil_bsr_spmm_t,
        stencil_bsr_spmm_t_pallas,
    )

    platform = jax.devices()[0].platform
    dtype = np.float32 if platform == "tpu" else np.float64

    a = elasticity3d(args.nel, args.nel, args.nel)
    a, _ = sym_rac_scaling(a)
    n, nnz = a.shape[0], a.nnz
    rng = np.random.default_rng(0)

    fmts = args.formats.split(",")
    mats = {}
    if "ell" in fmts:
        mats["ell"] = csr_to_ell(a, dtype=dtype)
    if "dia" in fmts or "dia_tbn" in fmts:
        # hybrid DIA+ELL with automatic ordering: the general-matrix path
        # (no stencil block structure assumed)
        from prealps_tpu.ops.formats import csr_to_dia_ell_auto

        mats["dia"], _ = csr_to_dia_ell_auto(a, min_fill=0.05, dtype=dtype)
        mats["dia_tbn"] = mats["dia"]
    if "stencil_t" in fmts or "stencil_t_pallas" in fmts:
        sb = csr_to_stencil_bsr_t(a, br=3, dtype=dtype)
        mats["stencil_t"] = sb
        mats["stencil_t_pallas"] = sb

    for t in (int(v) for v in args.t.split(",")):
        x = jnp.asarray(rng.standard_normal((n, t)).astype(dtype))
        nrb = n // 3
        xt = jnp.asarray(
            np.ascontiguousarray(np.asarray(x).reshape(nrb, 3, t).transpose(2, 1, 0))
        )
        for name in fmts:
            if name not in mats:
                continue
            if name == "ell":
                fn = jax.jit(lambda v: ell_spmm(mats["ell"], v))
                arg = x
            elif name == "dia":
                fn = jax.jit(lambda v: dia_ell_spmm(mats["dia"], v))
                arg = x
            elif name == "dia_tbn":
                # lane-major br=1 stencil on the promoted diagonals +
                # transposed straggler gather (parallel/driver.py dia+tbn)
                de = mats["dia_tbn"]
                d_t = de.diags[:, None, None, :]
                halo_d = max(max(abs(o) for o in de.offsets), 0)
                from prealps_tpu.ops.spmm import (
                    stencil_pallas_bs_ext,
                    stencil_pallas_chunk,
                    stencil_scan_accumulate,
                )

                def dia_tbn_fn(v, de=de, d_t=d_t, halo_d=halo_d):
                    nloc = v.shape[2]
                    x_ext = jnp.concatenate(
                        [v[:, :, nloc - halo_d:], v, v[:, :, :halo_d]],
                        axis=2)
                    chunk_ = stencil_pallas_chunk(
                        v.shape[0], 1, d_t.shape[0])
                    if platform == "tpu" and chunk_ >= halo_d:
                        y = stencil_pallas_bs_ext(
                            d_t, de.offsets, x_ext, halo_d, chunk=chunk_)
                    else:
                        y = stencil_scan_accumulate(
                            d_t, de.offsets, x_ext, halo_d)
                    if de.rem is not None:
                        g = v[:, 0, :].T[de.rem.cols]
                        y = y + jnp.einsum(
                            "ml,mlt->mt", de.rem.vals, g,
                            precision=jax.lax.Precision.HIGHEST).T[:, None]
                    return y

                fn = jax.jit(dia_tbn_fn)
                arg = jnp.asarray(np.ascontiguousarray(
                    np.asarray(x).T))[:, None, :]
            elif name == "stencil_t":
                fn = jax.jit(lambda v: stencil_bsr_spmm_t(mats["stencil_t"], v))
                arg = xt
            else:
                if platform != "tpu":
                    continue
                fn = jax.jit(
                    lambda v: stencil_bsr_spmm_t_pallas(mats["stencil_t_pallas"], v)
                )
                arg = xt
            y = fn(arg)
            jax.block_until_ready(y)
            # honest timing (docs/PERFORMANCE.md round 3): in-dispatch
            # data-dependent chain, two lengths differenced
            from prealps_tpu.utils.timing import scan_differential_ms

            k_s = max(args.reps // 4, 4)
            ms = scan_differential_ms(fn, arg, k_short=k_s, k_long=5 * k_s)
            print(json.dumps({
                "format": name, "t": t, "n": n, "nnz": nnz,
                "ms": round(ms, 3),
                "gnnz_per_s": round(nnz / ms / 1e6, 2),
                "platform": platform,
            }))


if __name__ == "__main__":
    main()
