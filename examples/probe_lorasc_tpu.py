#!/usr/bin/env python
"""TPU probe: ECG + scalable LORASC at benchmark scale (n≈148k het elasticity).

Not part of the test suite — a measurement harness for docs/PERFORMANCE.md.
Knobs: PREALPS_PROBE_NEL, _NPARTS, _DEFL, _T, _TOL, _HET, _SHIFT.
"""

import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    nel = int(os.environ.get("PREALPS_PROBE_NEL", "36"))
    nparts = int(os.environ.get("PREALPS_PROBE_NPARTS", "8"))
    defl = int(os.environ.get("PREALPS_PROBE_DEFL", "128"))
    t = int(os.environ.get("PREALPS_PROBE_T", "12"))
    tol = float(os.environ.get("PREALPS_PROBE_TOL", "1e-5"))
    het = bool(int(os.environ.get("PREALPS_PROBE_HET", "1")))
    shift = float(os.environ.get("PREALPS_PROBE_SHIFT", "0"))
    os.environ.setdefault("PREALPS_STENCIL_IMPL", "pallas")
    dtype = np.float32 if on_tpu else np.float64

    from prealps_tpu.core.generators import elasticity3d
    from prealps_tpu.parallel.lorasc_stencil import StencilLorascECG
    from prealps_tpu.solvers.ecg import ECGOptions

    t0 = time.time()
    cache = f"/tmp/prealps_ela_{nel}_{int(het)}.npz"
    if os.path.exists(cache):
        import scipy.sparse as sp

        d = np.load(cache)
        a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                          shape=tuple(d["shape"]))
    else:
        a = elasticity3d(nel, nel, nel, heterogeneous=het)
    log(f"matrix n={a.shape[0]} nnz={a.nnz} ({time.time()-t0:.0f}s)")

    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.shape[0])

    variant = os.environ.get("PREALPS_PROBE_VARIANT", "omin")
    correction = os.environ.get("PREALPS_PROBE_CORRECTION", "deflate")
    hr_env = os.environ.get("PREALPS_PROBE_HOST_REFINE", "")
    host_refine = None if hr_env == "" else bool(int(hr_env))
    repeats = int(os.environ.get("PREALPS_PROBE_REPEATS", "1"))

    t0 = time.time()
    solver = StencilLorascECG.build(
        a, nparts=nparts, br=3, grid=(nel + 1, nel + 1, nel),
        opts=ECGOptions(t=t, tol=tol, maxiter=3000, layout="tbn",
                        variant=variant,
                        stall_window=int(os.environ.get("PREALPS_PROBE_STALL", "0")) or 0),
        dtype=dtype, max_deflation=defl, shift=shift,
        refine=bool(int(os.environ.get("PREALPS_PROBE_REFINE", "1"))),
        host_refine=host_refine, correction=correction,
    )
    build_t = time.time() - t0
    plan = solver.precond.plan
    log(f"build {build_t:.1f}s stages={solver.precond.timings} "
        f"deflated={solver.precond.deflated} "
        f"bs_i={plan.bs_i} nblk_i={plan.nblk_i} bs_g={plan.bs_g} "
        f"nblk_g={plan.nblk_g} ng={plan.ng}")

    t0 = time.time()
    x, info = solver.solve(b)
    warm = time.time() - t0
    log(f"warm solve {warm:.1f}s iters={info['iters']} "
        f"rounds={info.get('refine_rounds')}")
    runs = []
    for _ in range(repeats):
        t0 = time.time()
        x, info = solver.solve(b)
        runs.append((round(time.time() - t0, 3), info["iters"]))
    tts, iters = min(runs)
    relres = np.linalg.norm(b - a @ x) / np.linalg.norm(b)
    log(f"timed solves {runs} relres={relres:.2e}")
    print(dict(build_s=round(build_t, 1), stages=solver.precond.timings,
               tts=tts, iters=iters, runs=runs, relres=float(relres),
               deflated=solver.precond.deflated, het=het, nparts=nparts,
               variant=variant, correction=correction,
               host_refine=host_refine, defl=defl))


if __name__ == "__main__":
    main()
