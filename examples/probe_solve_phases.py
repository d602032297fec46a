#!/usr/bin/env python
"""Phase breakdown of the het-LORASC solve: where does the non-iteration
time go? (host residual matvecs, tunnel H2D/D2H, init dispatch, chunked
device loop, finalize). Reproduces StencilLorascECG.solve round by round
with timers; fresh rhs per run (result-cache discipline)."""
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[probe {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main():
    os.environ.setdefault("PREALPS_STENCIL_IMPL", "pallas")
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
    from prealps_tpu.solvers.ecg import ecg_finalize

    opts = ECGOptions(t=12, tol=1e-5, maxiter=3000, variant="omin",
                      layout="tbn")
    t0 = time.time()
    solver = StencilLorascECG.build(
        a, nparts=8, br=3, grid=(nel + 1, nel + 1, nel), opts=opts,
        dtype=np.float32, max_deflation=256, inner_tol=1e-3,
        correction="deflate")
    log(f"build {time.time()-t0:.0f}s deflated={solver.precond.deflated} "
        f"factor dtype={solver.precond.operands['aii_linv'].dtype}")

    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.shape[0])
    x, info = solver.solve(b)   # warm/compile
    log(f"warm solve info={info}")

    a_s = solver.a_scaled
    opts_i = solver.opts
    init, step = solver._fn

    def one_solve(b):
        ph = {"host_res": 0.0, "prep_h2d_init": 0.0, "loop": 0.0,
              "fin_d2h": 0.0, "iters": [], "rounds": 0}
        b_eff = solver.scale_d * b
        normb0 = np.linalg.norm(b_eff)
        x = np.zeros_like(b_eff)
        t_all = time.perf_counter()
        prev = np.inf
        for _ in range(8):
            t1 = time.perf_counter()
            r = b_eff - a_s @ x
            relres = np.linalg.norm(r) / normb0
            ph["host_res"] += time.perf_counter() - t1
            if relres <= solver.target_tol or relres > 0.9 * prev:
                break
            prev = relres
            ph["rounds"] += 1
            t1 = time.perf_counter()
            b_lane = np.ascontiguousarray(
                r.astype(np.float32).reshape(solver.nrb, solver.br).T)
            state, normb = init(jnp.asarray(b_lane), solver._m_ops)
            normb_f = float(normb)
            ph["prep_h2d_init"] += time.perf_counter() - t1
            tol_abs = opts_i.tol * normb_f
            t1 = time.perf_counter()
            prev_it = -1
            while True:
                state, flags = step(state, normb, solver._m_ops)
                it, res_now, brk, bs, stall = np.asarray(flags)
                it = int(it)
                if (res_now <= tol_abs or it >= opts_i.maxiter or brk
                        or bs <= 0 or it == prev_it):
                    break
                prev_it = it
            ph["loop"] += time.perf_counter() - t1
            ph["iters"].append(it)
            t1 = time.perf_counter()
            res = ecg_finalize(state, normb, opts_i.layout)
            dx = np.ascontiguousarray(np.asarray(res.x).T).reshape(-1)
            ph["fin_d2h"] += time.perf_counter() - t1
            x = x + dx.astype(np.float64)
        ph["total"] = time.perf_counter() - t_all
        return ph

    for k in range(3):
        bq = rng.standard_normal(a.shape[0])
        ph = one_solve(bq)
        print({k2: (round(v, 4) if isinstance(v, float) else v)
               for k2, v in ph.items()}, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
