#!/usr/bin/env python
"""General (irregular, non-stencil) matrix SpMM benchmark — VERDICT #4.

The reference's mkl_dcsrmm runs ARBITRARY CSR at memory speed
(reference: utils/cplm_light/cplm_kernels.c:620-671). This repo's general-
matrix fast path is hybrid DIA+ELL after RCM (ops/formats.py::
csr_to_dia_ell_auto): promoted dense diagonals ride the same flat Pallas
stencil kernel as grid operators (a DIA matrix is a br=1 stencil), the
straggler remainder is one transposed ELL gather.

Matrix: random geometric graph (points in a unit cube, ~26 neighbors each)
— genuinely irregular sparsity, no grid structure, RCM-banded like any
real FEM-ish SuiteSparse matrix. Same nnz scale as the stencil benchmark.

Timing: scan-differential inside one dispatch (docs/PERFORMANCE.md round-3
methodology). Prints JSON lines; the target is the general path within 3×
of the stencil path at equal nnz.

Usage: python examples/bench_spmm_general.py [--npts 420000] [--t 12]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp


def random_geometric_spd(npts: int, k: int = 25, seed: int = 0):
    """SPD matrix on a random geometric graph (kNN in the unit cube)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    pts = rng.random((npts, 3))
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=k + 1)           # self + k neighbors
    rows = np.repeat(np.arange(npts), k)
    cols = idx[:, 1:].ravel()
    vals = -np.exp(-rng.random(rows.size))      # negative off-diagonals
    a = sp.coo_matrix((vals, (rows, cols)), shape=(npts, npts))
    a = a.minimum(a.T) + a.minimum(a.T).T - a.minimum(a.T).multiply(0)
    a = 0.5 * (a + a.T).tocsr()
    a.setdiag(0)
    a.eliminate_zeros()
    d = -np.asarray(a.sum(axis=1)).ravel() + 1e-3
    a = a + sp.diags(d)                         # diagonally dominant -> SPD
    return a.tocsr()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npts", type=int, default=420_000)
    ap.add_argument("--t", type=int, default=12)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    dtype = np.float32 if platform == "tpu" else np.float64

    cache = f"/tmp/prealps_geo_{args.npts}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                          shape=tuple(d["shape"]))
    else:
        a = random_geometric_spd(args.npts)
        np.savez(cache, data=a.data, indices=a.indices, indptr=a.indptr,
                 shape=np.array(a.shape))
    n, nnz = a.shape[0], a.nnz
    print(f"# irregular geometric matrix n={n} nnz={nnz} "
          f"avg row {nnz/n:.1f}", file=sys.stderr, flush=True)

    from prealps_tpu.ops.formats import csr_to_dia_ell_auto
    from prealps_tpu.ops.spmm import dia_ell_spmm

    t0 = time.time()
    de, perm = csr_to_dia_ell_auto(a, min_fill=0.05, dtype=dtype)
    conv_s = time.time() - t0
    ndiag = de.diags.shape[0]
    rem_nnz = int((np.asarray(de.rem.vals) != 0).sum()) if de.rem is not None else 0
    dia_nnz = int((np.asarray(de.diags) != 0).sum())
    fill = (de.diags.size + (de.rem.vals.size if de.rem is not None else 0)
            ) / nnz
    print(f"# dia+ell: {ndiag} diagonals ({dia_nnz/nnz:.0%} of nnz), "
          f"remainder {rem_nnz/nnz:.0%}, storage fill {fill:.2f}x, "
          f"convert {conv_s:.0f}s", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, args.t)).astype(dtype))

    # correctness
    y = dia_ell_spmm(de, x)
    ap_ = a[perm][:, perm] if perm is not None else a
    ref = ap_ @ np.asarray(x)
    err = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert err < 1e-4, err
    print(f"# correctness vs scipy: relerr {err:.2e}", file=sys.stderr,
          flush=True)

    norm = lambda z: z / jnp.sqrt(jnp.mean(z * z) + 1.0)

    def timed(apply_fn, mat, z0):
        @functools.partial(jax.jit, static_argnums=(1,))
        def many(z, k, m):
            def step(c, _):
                y = norm(apply_fn(m, c))
                if y.shape[0] != c.shape[0]:
                    y = jnp.concatenate([y, c[y.shape[0]:]], axis=0)
                return y, None
            z, _ = jax.lax.scan(step, z, None, length=k)
            return z

        def best(k, z, reps=3):
            b = 1e9
            for _ in range(reps):
                t0 = time.time()
                z = many(z, k, mat)
                z.block_until_ready()
                b = min(b, time.time() - t0)
            return b, z

        z = many(z0, 24, mat)
        z.block_until_ready()
        t_s, z = best(24, z)
        t_l, _ = best(120, z)
        return (t_l - t_s) / 96 * 1e3

    ms = timed(dia_ell_spmm, de, x)
    print(json.dumps({
        "metric": "spmm_general_geometric_dia_ell", "value": round(ms, 4),
        "unit": "ms", "gnnz_per_s": round(nnz / ms / 1e6, 2),
        "platform": platform, "n": n, "nnz": nnz, "t": args.t,
        "ndiag": ndiag, "fill": round(float(fill), 2),
        "remainder_frac": round(rem_nnz / nnz, 3),
    }), flush=True)

    # Morton-clustered 8x8 block-ELL: amortizes the gather-rate ceiling
    # (~0.2 G gathered rows/s on this chip regardless of width — measured,
    # docs/PERFORMANCE.md) over 8-point clusters. Needs point coordinates.
    from prealps_tpu.ops.formats import csr_to_block_ell
    from prealps_tpu.ops.spmm import block_ell_spmm

    d2 = np.load(cache)  # regenerate coords deterministically
    rng2 = np.random.default_rng(0)
    pts = rng2.random((args.npts, 3))
    q = np.minimum((pts * 1024).astype(np.int64), 1023)

    def spread(v):
        v = v.astype(np.int64)
        v = (v | (v << 32)) & 0x1F00000000FFFF
        v = (v | (v << 16)) & 0x1F0000FF0000FF
        v = (v | (v << 8)) & 0x100F00F00F00F00F
        v = (v | (v << 4)) & 0x10C30C30C30C30C3
        v = (v | (v << 2)) & 0x1249249249249249
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    pm = np.argsort(code, kind="stable")
    apm = a[pm][:, pm].tocsr()
    ab = csr_to_block_ell(apm, bm=8, bk=8, dtype=dtype)
    ncp = ab.blkcols.shape[0] * 8 if hasattr(ab, "blkcols") else n
    xb = jnp.asarray(
        rng.standard_normal((-(-n // 8) * 8, args.t)).astype(dtype))
    yb = block_ell_spmm(ab, xb)
    refb = apm @ np.asarray(xb)[:n]
    errb = (np.linalg.norm(np.asarray(yb)[:n] - refb)
            / np.linalg.norm(refb))
    assert errb < 1e-4, errb
    msb = timed(block_ell_spmm, ab, xb)
    print(json.dumps({
        "metric": "spmm_general_geometric_blockell_morton",
        "value": round(msb, 4), "unit": "ms",
        "gnnz_per_s": round(nnz / msb / 1e6, 2), "platform": platform,
        "n": n, "nnz": nnz, "t": args.t,
        "fill": round(float(ab.blocks.size / nnz), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
