"""ECG solver tests: convergence, variant parity, adaptive reduction,
preconditioning — single device (distributed in test_distributed.py).

Mirrors the reference's verification strategy (SURVEY.md §4): end-to-end
relative residual ‖b−Ax‖/‖b‖ checked against the ORIGINAL matrix, iteration
counts compared across variants and against plain CG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from prealps_tpu.ops.formats import csr_to_ell
from prealps_tpu.ops.spmm import ell_spmm
from prealps_tpu.precond import Identity, build_block_jacobi
from prealps_tpu.solvers import ECGOptions, ecg_solve


def _solve(a, b, opts, precond=None):
    ae = csr_to_ell(a)
    a_apply = lambda x: ell_spmm(ae, x)
    m_apply = precond.apply if precond is not None else None
    fn = jax.jit(lambda bb: ecg_solve(a_apply, m_apply, bb, opts))
    return fn(jnp.asarray(b))


def _relres(a, x, b):
    return np.linalg.norm(b - a @ np.asarray(x)) / np.linalg.norm(b)


def _cg_iters(a, b, tol):
    it = 0

    def cb(xk):
        nonlocal it
        it += 1

    x, info = spla.cg(a, b, rtol=tol, maxiter=100000, callback=cb)
    return it


@pytest.fixture(scope="module")
def ela_problem(ela_small):
    """Scaled heterogeneous elasticity problem — the reference's operator
    build always applies symmetric RAC scaling first (operator.c:38)."""
    from prealps_tpu.core.scaling import sym_rac_scaling

    a, d = sym_rac_scaling(ela_small)
    b = np.random.default_rng(42).standard_normal(a.shape[0])
    return a, b


class TestECGVariants:
    @pytest.mark.parametrize("variant", ["omin", "odir", "odir_fused"])
    def test_converges_elasticity(self, ela_problem, variant):
        a, b = ela_problem
        opts = ECGOptions(t=4, tol=1e-6, maxiter=3000, variant=variant)
        res = _solve(a, b, opts)
        assert not bool(res.breakdown)
        assert _relres(a, res.x, b) < 5e-6, f"{variant}: relres too large"
        assert int(res.iters) < 3000

    @pytest.mark.parametrize("variant", ["omin", "odir", "odir_fused"])
    def test_converges_lfat5(self, lfat5, rng, variant):
        # LFAT5 is extremely ill-conditioned; the reference always sym-scales
        # at operator build (operator.c:38), mirrored here.
        from prealps_tpu.core.scaling import sym_rac_scaling

        a, d = sym_rac_scaling(lfat5)
        b = rng.standard_normal(a.shape[0])
        opts = ECGOptions(t=2, tol=1e-8, maxiter=500, variant=variant)
        res = _solve(a, b, opts)
        assert _relres(a, res.x, b) < 1e-6

    def test_enlarging_reduces_iterations(self, ela_problem):
        a, b = ela_problem
        iters = {}
        for t in (1, 4, 8):
            opts = ECGOptions(t=t, tol=1e-6, maxiter=5000, variant="odir")
            res = _solve(a, b, opts)
            iters[t] = int(res.iters)
        assert iters[4] < iters[1]
        assert iters[8] <= iters[4]

    def test_matches_cg_at_t1(self, ela_problem):
        # with t=1 ECG is (preconditioned) CG; iteration counts should be close
        a, b = ela_problem
        opts = ECGOptions(t=1, tol=1e-6, maxiter=8000, variant="omin")
        res = _solve(a, b, opts)
        cg_it = _cg_iters(a, b, 1e-6)
        assert abs(int(res.iters) - cg_it) <= max(5, 0.2 * cg_it)

    def test_history_monotone_tail(self, ela_problem):
        a, b = ela_problem
        opts = ECGOptions(t=4, tol=1e-6, maxiter=3000, variant="odir_fused")
        res = _solve(a, b, opts)
        h = np.asarray(res.history)
        h = h[h >= 0]
        assert h[-1] <= h[0]
        # loosely decreasing: final residual far below initial
        assert h[-1] < 1e-4 * h[0]


class TestBlockJacobi:
    def test_apply_is_blockdiag_solve(self, ela_small, rng):
        a = ela_small
        bj = build_block_jacobi(a, nblocks=4)
        z = rng.standard_normal((a.shape[0], 3))
        w = np.asarray(jax.jit(bj.apply)(jnp.asarray(z)))
        # compare against scipy per-block solves
        from prealps_tpu.core.partition import nsplit

        offs = nsplit(a.shape[0], 4)
        w_ref = np.zeros_like(z)
        for i in range(4):
            r0, r1 = offs[i], offs[i + 1]
            w_ref[r0:r1] = spla.spsolve(a[r0:r1, r0:r1].tocsc(), z[r0:r1])
        np.testing.assert_allclose(w, w_ref, rtol=1e-8, atol=1e-10)

    def test_preconditioning_reduces_iterations(self, ela_problem):
        a, b = ela_problem
        opts = ECGOptions(t=4, tol=1e-6, maxiter=4000, variant="odir_fused")
        res_plain = _solve(a, b, opts)
        bj = build_block_jacobi(a, nblocks=8)
        res_bj = _solve(a, b, opts, precond=bj)
        assert _relres(a, res_bj.x, b) < 5e-6
        assert int(res_bj.iters) < int(res_plain.iters)


class TestAdaptive:
    @pytest.mark.parametrize("variant", ["omin", "odir", "odir_fused"])
    def test_adaptive_converges(self, ela_problem, variant):
        a, b = ela_problem
        opts = ECGOptions(t=8, tol=1e-6, maxiter=3000, variant=variant,
                          adaptive=True, adaptive_mode="freeze")
        res = _solve(a, b, opts)
        assert _relres(a, res.x, b) < 5e-6
        # block size must have been reduced at some point near convergence
        assert int(res.bs) <= 8

    def test_adaptive_reduces_block_size(self, ela_problem):
        a, b = ela_problem
        opts = ECGOptions(t=8, tol=1e-8, maxiter=5000, variant="odir_fused",
                          adaptive=True, adaptive_mode="freeze")
        res = _solve(a, b, opts)
        assert _relres(a, res.x, b) < 5e-8
        assert int(res.bs) < 8, "expected dynamic reduction to trigger"


class TestCheckpoint:
    def test_checkpoint_resume_matches_straight_solve(self, ela_problem, tmp_path):
        import os

        from prealps_tpu.ops.formats import csr_to_ell
        from prealps_tpu.ops.spmm import ell_spmm
        from prealps_tpu.solvers.checkpoint import ecg_solve_checkpointed

        a, b = ela_problem
        ae = csr_to_ell(a)
        a_apply = lambda x: ell_spmm(ae, x)
        opts = ECGOptions(t=4, tol=1e-6, maxiter=2000, variant="odir_fused")
        path = str(tmp_path / "state.npz")

        res_plain = _solve(a, b, opts)
        chunks = []
        res_ck = ecg_solve_checkpointed(
            a_apply, None, jnp.asarray(b), opts, path, every=25,
            on_chunk=lambda it, r: chunks.append(it),
        )
        assert int(res_ck.iters) == int(res_plain.iters)
        np.testing.assert_allclose(
            np.asarray(res_ck.x), np.asarray(res_plain.x), rtol=1e-10, atol=1e-12
        )
        assert len(chunks) >= 2

        # simulate crash + resume: wipe nothing, call again — resumes at the
        # final snapshot and exits immediately
        res_again = ecg_solve_checkpointed(
            a_apply, None, jnp.asarray(b), opts, path, every=25
        )
        assert int(res_again.iters) == int(res_ck.iters)

    def test_resume_from_partial_state(self, ela_problem, tmp_path):
        from prealps_tpu.ops.formats import csr_to_ell
        from prealps_tpu.ops.spmm import ell_spmm
        from prealps_tpu.solvers.checkpoint import (
            ecg_solve_checkpointed,
            load_state,
            save_state,
        )
        from prealps_tpu.solvers.ecg import ecg_init, ecg_run

        a, b = ela_problem
        ae = csr_to_ell(a)
        a_apply = lambda x: ell_spmm(ae, x)
        m_apply = lambda v: v
        opts = ECGOptions(t=4, tol=1e-6, maxiter=2000, variant="odir_fused")
        path = str(tmp_path / "partial.npz")

        # run 30 iterations, snapshot, then resume in a "new process"
        state, normb = ecg_init(a_apply, m_apply, jnp.asarray(b), opts)
        state = ecg_run(a_apply, m_apply, state, normb, opts, max_steps=30)
        assert int(state.it) == 30
        save_state(path, state, normb)

        state2, normb2 = load_state(path)
        assert int(state2.it) == 30
        res = ecg_solve_checkpointed(a_apply, None, jnp.asarray(b), opts, path, every=50)
        res_plain = _solve(a, b, opts)
        assert abs(int(res.iters) - int(res_plain.iters)) <= 1


class TestWarmStart:
    def test_x0_converges_and_saves_iterations(self, ela_problem):
        a, b = ela_problem
        opts = ECGOptions(t=4, tol=1e-8, maxiter=4000)
        cold = _solve(a, b, opts)
        # warm start from a partially-converged solution
        x_exact = spla.spsolve(sp.csc_matrix(a), b)
        x0 = x_exact + 1e-4 * np.random.default_rng(1).standard_normal(
            x_exact.shape)
        ae = csr_to_ell(a)
        warm = jax.jit(
            lambda bb, xx: ecg_solve(
                lambda v: ell_spmm(ae, v), None, bb, opts, x0=xx)
        )(jnp.asarray(b), jnp.asarray(x0))
        assert _relres(a, warm.x, b) < 1e-7
        # the solver worked on the shifted system: its rhs is the small
        # initial residual, not b (a random-direction x0 error repopulates
        # every slow mode, so the iteration COUNT needn't drop)
        assert float(warm.normb) < 1e-2 * np.linalg.norm(b)
        assert int(warm.iters) <= int(cold.iters) + 5

    def test_x0_tbn_layout(self, ela_problem):
        from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
        from prealps_tpu.ops.spmm import stencil_bsr_spmm_t

        a, b = ela_problem
        st = csr_to_stencil_bsr_t(a, br=3)
        n = a.shape[0]
        nrb = n // 3
        opts = ECGOptions(t=4, tol=1e-8, maxiter=4000, layout="tbn")
        b_lane = jnp.asarray(np.ascontiguousarray(b.reshape(nrb, 3).T))
        x0 = 0.5 * spla.spsolve(sp.csc_matrix(a), b)
        x0_lane = jnp.asarray(np.ascontiguousarray(x0.reshape(nrb, 3).T))
        res = jax.jit(
            lambda bb, xx: ecg_solve(
                lambda v: stencil_bsr_spmm_t(st, v), None, bb, opts, x0=xx)
        )(b_lane, x0_lane)
        x = np.asarray(res.x).T.reshape(-1)
        assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 1e-7


class TestStackedIteration:
    """The stacked odir_fused fast path (one Gram + one coefficient GEMM,
    solvers/ecg.py::_iter_odir_fused_stacked) must reproduce the unstacked
    iteration: same algebra through the Cholesky factor, different GEMM
    grouping."""

    def test_matches_unstacked(self, ela_problem):
        from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
        from prealps_tpu.ops.spmm import stencil_bsr_spmm_t

        a, b = ela_problem
        st = csr_to_stencil_bsr_t(a, br=3)
        nrb = a.shape[0] // 3
        b_lane = jnp.asarray(np.ascontiguousarray(b.reshape(nrb, 3).T))
        results = {}
        for stacked in (False, True):
            opts = ECGOptions(t=4, tol=1e-9, maxiter=4000, layout="tbn",
                              variant="odir_fused", stacked=stacked)
            res = jax.jit(
                lambda bb, o=opts: ecg_solve(
                    lambda v: stencil_bsr_spmm_t(st, v), None, bb, o)
            )(b_lane)
            x = np.asarray(res.x).T.reshape(-1)
            assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 1e-8
            results[stacked] = int(res.iters)
        # identical algebra -> iteration counts match (tight band for
        # rounding-order differences)
        assert abs(results[True] - results[False]) <= 2

    def test_checkpoint_roundtrip_stacked(self, tmp_path, ela_problem):
        """Stacked state is a plain pytree: snapshot/resume must still work
        (solvers/checkpoint.py treats states generically)."""
        from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
        from prealps_tpu.ops.spmm import stencil_bsr_spmm_t
        from prealps_tpu.solvers.checkpoint import load_state, save_state
        from prealps_tpu.solvers.ecg import ecg_finalize, ecg_init, ecg_run

        a, b = ela_problem
        st = csr_to_stencil_bsr_t(a, br=3)
        nrb = a.shape[0] // 3
        b_lane = jnp.asarray(np.ascontiguousarray(b.reshape(nrb, 3).T))
        opts = ECGOptions(t=4, tol=1e-9, maxiter=4000, layout="tbn")
        a_op = lambda v: stencil_bsr_spmm_t(st, v)
        m_op = lambda v: v
        s0, normb = ecg_init(a_op, m_op, b_lane, opts)
        s1 = ecg_run(a_op, m_op, s0, normb, opts, max_steps=5)
        path = str(tmp_path / "ck.npz")
        save_state(path, s1, normb)
        s1b, normb_b = load_state(path)
        s2 = ecg_run(a_op, m_op, s1b, normb_b, opts)
        res = ecg_finalize(s2, normb_b, opts.layout)
        x = np.asarray(res.x).T.reshape(-1)
        assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 1e-8

    def test_adaptive_matches_unstacked(self, ela_problem):
        """ADAPT_BS composes into the stacked coefficient matrix (the SVD
        rotation is one more right-multiplication); behavior must match the
        unstacked adaptive path."""
        from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
        from prealps_tpu.ops.spmm import stencil_bsr_spmm_t

        a, b = ela_problem
        st = csr_to_stencil_bsr_t(a, br=3)
        nrb = a.shape[0] // 3
        b_lane = jnp.asarray(np.ascontiguousarray(b.reshape(nrb, 3).T))
        for mode, check_conv in (("freeze", True), ("truncate", False)):
            out = {}
            for stacked in (False, True):
                opts = ECGOptions(t=8, tol=1e-8, maxiter=4000, layout="tbn",
                                  variant="odir_fused", adaptive=True,
                                  adaptive_mode=mode, stacked=stacked)
                res = jax.jit(
                    lambda bb, o=opts: ecg_solve(
                        lambda v: stencil_bsr_spmm_t(st, v), None, bb, o)
                )(b_lane)
                x = np.asarray(res.x).T.reshape(-1)
                if check_conv:  # truncate = exact reference semantics, which
                    #             stall on this problem (see test_parity)
                    assert (np.linalg.norm(b - a @ x)
                            / np.linalg.norm(b) < 1e-7)
                out[stacked] = (int(res.iters), int(res.bs))
            assert abs(out[True][0] - out[False][0]) <= 2, (mode, out)
            assert out[True][1] == out[False][1], (mode, out)

    @pytest.mark.parametrize("adaptive", [False, True])
    def test_omin_stacked_matches_unstacked(self, ela_problem, adaptive):
        """The stacked omin fast path (solvers/ecg.py::_iter_omin_stacked:
        one (3t)² Gram + composed coefficient GEMMs, two reductions like the
        reference's omin, ecg.c:289-400) must reproduce the unstacked omin —
        same algebra through the factor, different GEMM grouping. The
        stacked residual bookkeeping lags one iteration (fused convention),
        hence the ±2 band."""
        from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
        from prealps_tpu.ops.spmm import stencil_bsr_spmm_t

        a, b = ela_problem
        st = csr_to_stencil_bsr_t(a, br=3)
        nrb = a.shape[0] // 3
        b_lane = jnp.asarray(np.ascontiguousarray(b.reshape(nrb, 3).T))
        out = {}
        for stacked in (False, True):
            opts = ECGOptions(t=4, tol=1e-9, maxiter=4000, layout="tbn",
                              variant="omin", adaptive=adaptive,
                              stacked=stacked)
            res = jax.jit(
                lambda bb, o=opts: ecg_solve(
                    lambda v: stencil_bsr_spmm_t(st, v), None, bb, o)
            )(b_lane)
            x = np.asarray(res.x).T.reshape(-1)
            assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 1e-8
            out[stacked] = (int(res.iters), int(res.bs))
        assert abs(out[True][0] - out[False][0]) <= 2, out
        if adaptive:
            assert out[True][1] == out[False][1], out
