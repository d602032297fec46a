#!/usr/bin/env python
"""Benchmark: ECG time-to-solution + SpMM throughput on one chip.

Mirrors the reference's headline benchmark (BASELINE.md: ECG(t=12), tol=1e-5,
block-Jacobi, 3-D elasticity n=145,563 "Ela400" — 5.28 s on 24 Xeon cores /
2.16 s on 48). Here: the same problem family generated at the same scale
(elasticity3d 36³ elements → n=147,852, homogeneous like Ela400; set
PREALPS_BENCH_HET=1 for the high-contrast layered variant), solved on a
single TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline = reference_time / our_time (>1 ⇒ faster than the 24-proc
reference run).
"""

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    try:
        return _main()
    except Exception as e:  # still emit a machine-readable record on failure
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "ecg_tts_elasticity3d_145k_t12_tol1e-5",
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
            "converged": False, "error": f"{type(e).__name__}: {e}"[:300],
        }))
        return 1


def _probe_backend_alive(timeout_s: int = 180) -> bool:
    """The remote-attach TPU backend can go UNAVAILABLE (observed: backend
    init hangs indefinitely). Probe it in a SUBPROCESS with a timeout so the
    bench can fall back to the CPU backend instead of hanging forever."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _main():
    import os as _os

    if (_os.environ.get("JAX_PLATFORMS") not in (None, "", "cpu")
            and not _probe_backend_alive()):
        _log("accelerator backend unavailable (probe timed out) — "
             "falling back to CPU")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # true-f32 MXU accumulation everywhere (bf16 passes break CG convergence)
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent executable cache: repeat runs skip the (remote) compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    if not on_tpu:
        # CPU correctness path runs in real f64
        jax.config.update("jax_enable_x64", True)

    nel = int(os.environ.get("PREALPS_BENCH_NEL", "36"))
    t = int(os.environ.get("PREALPS_BENCH_T", "12"))
    tol = float(os.environ.get("PREALPS_BENCH_TOL", "1e-5"))
    maxiter = int(os.environ.get("PREALPS_BENCH_MAXITER", "3000"))
    # mb=240-row blocks measured fastest (docs/PERFORMANCE.md BJ sweep):
    # iteration count is governed by global modes, so halving block size
    # mostly just halves the HBM-bound apply traffic. The global low modes
    # themselves are handled by the default two-level preconditioner (bj2l:
    # BJ + geometric-RBM Nicolaides coarse space, precond/twolevel.py) —
    # 200 -> 130 iterations on the headline problem; PREALPS_BENCH_PRECOND
    # restores plain "bj" / "lorasc" / "chebyshev".
    block_size = int(os.environ.get("PREALPS_BENCH_BJ", "240"))
    fmt = os.environ.get("PREALPS_BENCH_FMT", "stencil")
    precond = os.environ.get("PREALPS_BENCH_PRECOND", "bj2l")
    # fastest measured stencil implementation (docs/PERFORMANCE.md)
    os.environ.setdefault("PREALPS_STENCIL_IMPL", "pallas")
    cheb_degree = int(os.environ.get("PREALPS_BENCH_CHEB_DEG", "8"))
    heterogeneous = bool(int(os.environ.get("PREALPS_BENCH_HET", "0")))
    inner_tol = float(os.environ.get("PREALPS_BENCH_INNER_TOL", "1e-3"))
    dtype = np.float32 if on_tpu else np.float64

    from prealps_tpu.core.generators import elasticity3d
    from prealps_tpu.parallel.driver import DistributedECG
    from prealps_tpu.solvers import ECGOptions

    t0 = time.time()
    cache = f"/tmp/prealps_ela_{nel}_{int(heterogeneous)}.npz"
    if os.path.exists(cache):
        import scipy.sparse as sp

        d = np.load(cache)
        a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]), shape=tuple(d["shape"]))
    else:
        a = elasticity3d(nel, nel, nel, heterogeneous=heterogeneous)
        np.savez(cache, data=a.data, indices=a.indices, indptr=a.indptr,
                 shape=np.array(a.shape))
    n, nnz = a.shape[0], a.nnz
    gen_t = time.time() - t0
    _log(f"matrix ready n={n} nnz={nnz} ({gen_t:.0f}s)")

    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    t0 = time.time()
    layout = "tbn" if fmt == "stencil" else "nt"
    opts = ECGOptions(t=t, tol=tol, maxiter=maxiter, variant="odir_fused",
                      layout=layout)
    if precond == "lorasc":
        # scalable LORASC (banded interiors + thick-restart Lanczos deflation)
        from prealps_tpu.parallel.lorasc_stencil import StencilLorascECG

        solver = StencilLorascECG.build(
            a, nparts=int(os.environ.get("PREALPS_BENCH_NPARTS", "8")),
            br=3, grid=(nel + 1, nel + 1, nel), opts=opts, dtype=dtype,
            max_deflation=int(os.environ.get("PREALPS_BENCH_DEFL", "256")),
            inner_tol=inner_tol,
        )
    else:
        kwargs = dict(
            block_size=block_size,
            bj_dtype=os.environ.get("PREALPS_BENCH_BJ_DTYPE", "f32"),
            # grid-aligned dedupe of repeated diagonal blocks (device_bj.py);
            # measured slightly behind plain mb=240 on TTS (more iterations
            # at line/slab granularity outweigh the deduped read — see
            # docs/PERFORMANCE.md), so off by default; BJ_DEDUPE=1 enables
            grid=(nel + 1, nel + 1, nel) if fmt == "stencil" else None,
            bj_dedupe=bool(int(os.environ.get("PREALPS_BENCH_BJ_DEDUPE", "0"))),
        ) if precond in ("bj", "block_jacobi", "bj2l") else dict(cheb_degree=cheb_degree)
        solver = DistributedECG.build(
            a, nshards=1, opts=opts, precond=precond,
            dtype=dtype, fmt=fmt, br=3, inner_tol=inner_tol, **kwargs,
        )
    build_t = time.time() - t0
    _log(f"solver built ({build_t:.0f}s); compiling + warm solve...")

    # warm-up (compile) then timed solve
    t0 = time.time()
    x, info = solver.solve(b)
    warm_t = time.time() - t0
    _log(f"warm solve done ({warm_t:.0f}s, iters={info['iters']}); timing...")
    t0 = time.time()
    x, info = solver.solve(b)
    tts = time.time() - t0

    relres = float(np.linalg.norm(b - a @ x) / np.linalg.norm(b))

    # SpMM microbenchmark: the raw distributed A-apply via the ECG path is
    # what matters; approximate per-iteration SpMM cost from the solve:
    spmm_nnz_per_s = nnz * info["iters"] / tts if tts > 0 else 0.0

    baseline_24p = 5.28  # s, reference ECG(12) Ela400 on 24 Xeon cores
    out = {
        "metric": "ecg_tts_elasticity3d_145k_t12_tol1e-5",
        "value": round(tts, 4),
        "unit": "s",
        "vs_baseline": round(baseline_24p / tts, 3) if tts > 0 else 0.0,
        "platform": platform,
        "n": n,
        "nnz": nnz,
        "iters": info["iters"],
        "relres": relres,
        "converged": bool(relres < 10 * tol),
        "fmt": fmt,
        "precond": precond,
        "heterogeneous": heterogeneous,
        "build_s": round(build_t, 2),
        "compile_s": round(warm_t - tts, 2),
        "gen_s": round(gen_t, 2),
        "spmm_nnz_per_s_est": round(spmm_nnz_per_s / 1e9, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
