#!/usr/bin/env python
"""Split the headline-solve TTS into device-compute vs tunnel-transfer vs
host-postprocessing (run on the real TPU; see docs/PERFORMANCE.md)."""
import os, sys, time
import numpy as np

def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import scipy.sparse as sp
    d = np.load("/tmp/prealps_ela_36_0.npz")
    a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=tuple(d["shape"]))
    from prealps_tpu.parallel.driver import DistributedECG
    from prealps_tpu.solvers import ECGOptions
    bj = int(os.environ.get("PREALPS_BENCH_BJ", "256"))
    dedupe = bool(int(os.environ.get("PREALPS_BENCH_BJ_DEDUPE", "0")))
    opts = ECGOptions(t=12, tol=1e-5, maxiter=3000, variant="odir_fused", layout="tbn")
    solver = DistributedECG.build(
        a, nshards=1, opts=opts, precond="block_jacobi", dtype=np.float32,
        fmt="stencil", br=3, inner_tol=1e-3, block_size=bj,
        grid=(37, 37, 36) if dedupe else None, bj_dedupe=dedupe)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.shape[0])
    x, info = solver.solve(b)          # warm
    # --- instrumented round ---
    b_eff = solver.scale_d * b
    key = hash(b_eff.tobytes())
    assert solver._b2_key == key       # rhs resident
    for rep in range(3):
        t0 = time.time()
        fut = solver._refine_packed_fn(solver._b2_dev, *solver._operands)
        t1 = time.time()
        fut.block_until_ready()
        t2 = time.time()
        flat = np.asarray(fut)
        t3 = time.time()
        # host post: unpack + unpad + f64 check
        hist_len = solver.opts.maxiter
        xflat = flat[6 + hist_len:].astype(np.float64)
        n_pad = solver.layout.n_pad
        x_np = xflat.reshape(solver._br, n_pad // solver._br)
        x_np = np.ascontiguousarray(x_np.T).reshape(-1)
        from prealps_tpu.core.layout import unpad_from_padded
        xx = unpad_from_padded(solver.layout, x_np)
        r = b_eff - solver.a_scaled @ xx
        rr = float(np.linalg.norm(r) / np.linalg.norm(b_eff))
        t4 = time.time()
        print(f"rep{rep}: dispatch {t1-t0:.3f}s  device-compute {t2-t1:.3f}s  "
              f"D2H({flat.nbytes/1e6:.2f}MB) {t3-t2:.3f}s  host-post {t4-t3:.3f}s  "
              f"TOTAL {t4-t0:.3f}s  relres {rr:.2e}  iters {int(flat[0])} rounds {int(flat[5])}",
              file=sys.stderr, flush=True)
    return 0

if __name__ == "__main__":
    sys.exit(main())
