#!/usr/bin/env python
"""fmt=auto validation: on each matrix CLASS, the detected format must be
the measured-best (or tied) of the manual formats — the done-criterion for
making structure extraction the product path (the reference's mkl_dcsrmm
"any CSR" role, utils/cplm_light/cplm_kernels.c:620-671).

Classes: grid stencil / banded / shuffled geometric / uniform random.
Formats measured per class: every convertible one of
  stencil (stencil_bsr_spmm_t), dia (dia_ell_spmm),
  block_ell 8x8 Morton (block_ell_spmm), ell (ell_spmm).

Timing: scan-differential inside one dispatch (docs/PERFORMANCE.md).
Prints one JSON line per class with per-format ms and the auto choice.
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


def make_matrices(scale: float, rng):
    from prealps_tpu.core.generators import elasticity3d

    out = {}
    # 1. grid stencil
    nel = max(int(18 * scale), 6)
    out["grid_stencil"] = sp.csr_matrix(elasticity3d(nel, nel, nel))

    # 2. banded: fixed sparse diagonals (a rotor/1-D-FEM-like profile)
    n = max(int(120_000 * scale), 2000)
    offs = [0, 1, 2, 3, 5, 8, 13, 21, 34]
    mats = [sp.diags(rng.random(n - o) + 0.1, o, shape=(n, n)) for o in offs]
    band = sum(mats[1:], mats[0])
    band = (band + band.T).tocsr()
    band = band + sp.diags(np.asarray(abs(band).sum(axis=1)).ravel())
    out["banded"] = sp.csr_matrix(band)

    # 3. geometric kNN graph, SHUFFLED (locality must be re-derived)
    from scipy.spatial import cKDTree

    npts = max(int(120_000 * scale), 2000)
    pts = rng.random((npts, 3))
    _, idx = cKDTree(pts).query(pts, k=26)
    rows = np.repeat(np.arange(npts), 25)
    a = sp.coo_matrix((np.ones(rows.size), (rows, idx[:, 1:].ravel())),
                      shape=(npts, npts))
    a = ((a + a.T) > 0).astype(np.float64)
    lap = sp.diags(np.asarray(a.sum(axis=1)).ravel() + 1.0) - a
    pm = rng.permutation(npts)
    out["geometric_shuffled"] = sp.csr_matrix(lap.tocsr()[pm][:, pm])

    # 4. uniform random pattern (no structure to extract)
    n = max(int(40_000 * scale), 1000)
    k = 24
    cols = rng.integers(0, n, size=(n, k))
    r = sp.coo_matrix(
        (rng.random(n * k), (np.repeat(np.arange(n), k), cols.ravel())),
        shape=(n, n))
    r = (r + r.T).tocsr()
    out["random"] = sp.csr_matrix(
        r + sp.diags(np.asarray(abs(r).sum(axis=1)).ravel() + 1.0))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=12)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="problem-size multiplier")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    dtype = np.float32 if platform == "tpu" else np.float64
    if platform != "tpu":
        jax.config.update("jax_enable_x64", True)

    from prealps_tpu.core.partition import morton_perm, pseudo_coords
    from prealps_tpu.ops.formats import (
        csr_to_block_ell,
        csr_to_dia_ell_auto,
        csr_to_ell,
        csr_to_stencil_bsr_t,
        detect_format,
    )
    from prealps_tpu.ops.spmm import (
        block_ell_spmm,
        dia_ell_spmm,
        ell_spmm,
        stencil_bsr_spmm_t,
    )

    norm = lambda z: z / jnp.sqrt(jnp.mean(z * z) + 1.0)

    def timed(apply_fn, mat, z0, reps=2):
        @functools.partial(jax.jit, static_argnums=(1,))
        def many(z, k):
            def step(c, _):
                y = norm(apply_fn(mat, c))
                if y.shape != c.shape:
                    y = y.reshape(c.shape)
                return y, None
            z, _ = jax.lax.scan(step, z, None, length=k)
            return z

        def best(k, z):
            b = 1e9
            z = many(z, k)
            z.block_until_ready()
            for _ in range(reps):
                t0 = time.time()
                z = many(z, k)
                z.block_until_ready()
                b = min(b, time.time() - t0)
            return b, z

        t_s, z = best(24, z0)
        t_l, _ = best(96, z)
        return max((t_l - t_s) / 72 * 1e3, 1e-6)

    rng = np.random.default_rng(0)
    mats = make_matrices(args.scale, rng)
    worst = 1.0
    for name, a in mats.items():
        n, nnz = a.shape[0], a.nnz
        results = {}
        x = rng.standard_normal((n, args.t)).astype(dtype)

        # --- manual formats (where convertible) ---
        st = csr_to_stencil_bsr_t(a, br=3, dtype=dtype) if n % 3 == 0 else None
        if st is not None:
            from prealps_tpu.ops.spmm import panel_to_lane_major

            xt = panel_to_lane_major(jnp.asarray(x), 3)
            results["stencil"] = timed(
                lambda m, z: stencil_bsr_spmm_t(m, z), st, xt)
        de, perm_d = csr_to_dia_ell_auto(a, min_fill=0.05, dtype=dtype)
        cov = float((np.asarray(de.diags) != 0).sum()) / nnz
        if cov >= 0.5:   # only bench DIA where diagonals carry real mass
            results["dia"] = timed(
                lambda m, z: dia_ell_spmm(m, z), de, jnp.asarray(x))

        pm = morton_perm(pseudo_coords(a))
        am = a[pm][:, pm].tocsr()
        bell = csr_to_block_ell(am, bm=8, bk=8, dtype=dtype)
        xb = jnp.asarray(np.vstack([x, np.zeros(
            (bell.shape[0] - n, args.t), dtype)]) if bell.shape[0] > n else x)
        results["block_ell_morton"] = timed(
            lambda m, z: block_ell_spmm(m, z), bell, xb)

        ell = csr_to_ell(a, dtype=dtype)
        results["ell"] = timed(lambda m, z: ell_spmm(m, z), ell,
                               jnp.asarray(x))

        # --- the auto choice ---
        chosen, info = detect_format(a, br=3)
        key = {"stencil": "stencil", "dia": "dia", "dia_rcm": "dia",
               "block_ell_morton": "block_ell_morton",
               "block_ell_natural": "block_ell_morton",
               "ell": "ell"}[chosen]
        auto_ms = results.get(key)
        best_ms = min(results.values())
        ratio = auto_ms / best_ms if auto_ms else float("inf")
        worst = max(worst, ratio)
        print(json.dumps({
            "metric": f"fmt_auto_{name}", "chosen": chosen,
            "auto_ms": round(auto_ms, 4) if auto_ms else None,
            "best_ms": round(best_ms, 4),
            "auto_vs_best": round(ratio, 3),
            "per_format_ms": {k: round(v, 4) for k, v in results.items()},
            "n": n, "nnz": nnz, "platform": platform,
            "gnnz_per_s_auto": round(nnz / auto_ms / 1e6, 2),
        }), flush=True)

    print(json.dumps({"metric": "fmt_auto_worst_ratio",
                      "value": round(worst, 3),
                      "pass": bool(worst <= 1.1)}), flush=True)
    return 0 if worst <= 1.1 else 1


if __name__ == "__main__":
    sys.exit(main())
