"""Interop with the scipy ecosystem.

The reference ships a PETSc interface used only for comparison baselines
(reference: utils/preAlps_cplm_petsc_interface.c); the Python-world analog is
scipy: these adapters let scipy code call our solvers and let our solvers
consume scipy operators, enabling the same side-by-side benchmarking
(e.g. scipy.sparse.linalg.cg vs ECG — see tests/test_interop.py).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def as_scipy_linear_operator(solver) -> spla.LinearOperator:
    """Wrap a built solver (DistributedECG / ECGSolver / DistributedLorascECG)
    as a scipy LinearOperator computing A⁻¹ b."""
    n = solver.layout.n if hasattr(solver, "layout") else solver.n

    def matvec(b):
        x, _ = solver.solve(np.asarray(b).ravel())
        return x

    return spla.LinearOperator((n, n), matvec=matvec, dtype=np.float64)


def precond_as_scipy(m_apply, n: int) -> spla.LinearOperator:
    """Wrap a jittable (n, t) panel preconditioner apply as a scipy
    LinearOperator (for use inside scipy.sparse.linalg.cg etc.)."""
    import jax.numpy as jnp

    def matvec(v):
        w = m_apply(jnp.asarray(np.asarray(v).reshape(n, 1)))
        return np.asarray(w).ravel()

    return spla.LinearOperator((n, n), matvec=matvec, dtype=np.float64)


def ecg_vs_scipy_cg(a: sp.spmatrix, b: np.ndarray, tol: float = 1e-6,
                    t: int = 4, maxiter: int = 10000):
    """Side-by-side comparison (the test_ecg_bench_petsc_pcg analog,
    reference: examples/test_ecg_bench_petsc_pcg.c). Returns a dict of
    iteration counts and residuals for scipy CG vs ECG."""
    import time

    from prealps_tpu.api import ECGSolver
    from prealps_tpu.solvers import ECGOptions

    it = {"cg": 0}

    def cb(_):
        it["cg"] += 1

    t0 = time.time()
    x_cg, info = spla.cg(a, b, rtol=tol, maxiter=maxiter, callback=cb)
    cg_time = time.time() - t0

    solver = ECGSolver.build(
        a, opts=ECGOptions(t=t, tol=tol, maxiter=maxiter), precond="block_jacobi"
    )
    t0 = time.time()
    x_ecg, ecg_info = solver.solve(b)
    ecg_time = time.time() - t0

    nb = np.linalg.norm(b)
    return {
        "cg_iters": it["cg"],
        "cg_relres": float(np.linalg.norm(b - a @ x_cg) / nb),
        "cg_time": cg_time,
        "ecg_iters": ecg_info["iters"],
        "ecg_relres": float(np.linalg.norm(b - a @ x_ecg) / nb),
        "ecg_time": ecg_time,
    }
