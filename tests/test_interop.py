"""scipy interop + golden regression tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from prealps_tpu.api import ECGSolver
from prealps_tpu.interop import as_scipy_linear_operator, ecg_vs_scipy_cg, precond_as_scipy
from prealps_tpu.solvers import ECGOptions


class TestInterop:
    def test_linear_operator_solves(self, ela_small, rng):
        b = rng.standard_normal(ela_small.shape[0])
        solver = ECGSolver.build(
            ela_small, opts=ECGOptions(t=4, tol=1e-8, maxiter=3000)
        )
        op = as_scipy_linear_operator(solver)
        x = op @ b
        assert np.linalg.norm(b - ela_small @ x) / np.linalg.norm(b) < 1e-6

    def test_precond_in_scipy_cg(self, ela_small, rng):
        from prealps_tpu.core.scaling import sym_rac_scaling
        from prealps_tpu.precond import build_block_jacobi

        a, d = sym_rac_scaling(ela_small)
        b = rng.standard_normal(a.shape[0])
        bj = build_block_jacobi(a, nblocks=8)
        m_op = precond_as_scipy(jax.jit(bj.apply), a.shape[0])
        it = {"n": 0}
        x, info = spla.cg(a, b, rtol=1e-8, maxiter=5000, M=m_op,
                          callback=lambda _: it.__setitem__("n", it["n"] + 1))
        it_plain = {"n": 0}
        spla.cg(a, b, rtol=1e-8, maxiter=5000,
                callback=lambda _: it_plain.__setitem__("n", it_plain["n"] + 1))
        assert info == 0
        assert it["n"] < it_plain["n"]

    def test_ecg_vs_scipy_cg_benchmark(self, ela_small, rng):
        b = rng.standard_normal(ela_small.shape[0])
        out = ecg_vs_scipy_cg(ela_small, b, tol=1e-6, t=4)
        assert out["ecg_relres"] < 1e-4
        assert out["cg_relres"] < 1e-4
        # the headline claim: enlarged CG needs far fewer iterations
        assert out["ecg_iters"] < out["cg_iters"]


class TestGolden:
    def test_residual_history_regression(self, ela_small, rng):
        """Self-golden determinism guard (SURVEY.md §4.4: the reference pins
        seeds/partitions for bit-stable verification): the iteration count
        for a fixed config must not drift across refactors."""
        b = np.random.default_rng(7).standard_normal(ela_small.shape[0])
        solver = ECGSolver.build(
            ela_small, opts=ECGOptions(t=4, tol=1e-6, maxiter=2000),
            precond="block_jacobi", nblocks=8,
        )
        x, info = solver.solve(b)
        x2, info2 = solver.solve(b)
        assert info["iters"] == info2["iters"]
        np.testing.assert_array_equal(x, x2)
        h = info["history"]
        h = h[h >= 0]
        assert len(h) == info["iters"]
        # monotone-ish decrease overall
        assert h[-1] < 1e-3 * h[0]

    def test_iteration_count_band(self, ela_small):
        """Regression band for a pinned config (SURVEY §4.4 determinism
        philosophy): t=4, tol 1e-6, BJ(8 blocks) on the 6x5x5 heterogeneous
        elasticity problem, seed 7. Iteration counts jumping out of this band
        signal an algorithmic regression (rounding-level drift stays within)."""
        b = np.random.default_rng(7).standard_normal(ela_small.shape[0])
        solver = ECGSolver.build(
            ela_small, opts=ECGOptions(t=4, tol=1e-6, maxiter=2000),
            precond="block_jacobi", nblocks=8,
        )
        x, info = solver.solve(b)
        assert 40 <= info["iters"] <= 110, info["iters"]
