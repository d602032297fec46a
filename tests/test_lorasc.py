"""LORASC preconditioner tests.

Mirrors the reference's verification (SURVEY.md §4, test_lorasc.c:501-514):
end-to-end ‖b−Ax‖/‖b‖ against the ORIGINAL (unscaled, unpermuted) matrix,
plus the headline property (BASELINE.md Table 4): LORASC cuts the iteration
count dramatically vs block Jacobi on heterogeneous elasticity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sp

from prealps_tpu.api import ECGSolver
from prealps_tpu.core.partition import block_arrow_structure, permute
from prealps_tpu.core.scaling import sym_rac_scaling
from prealps_tpu.precond.lorasc import build_lorasc, schur_complement_dense
from prealps_tpu.solvers import ECGOptions


def _relres(a, x, b):
    return np.linalg.norm(b - a @ x) / np.linalg.norm(b)


class TestLorascBuild:
    def test_apply_shapes_and_exactness_no_deflation_needed(self, poisson_small, rng):
        # on a well-conditioned matrix the eigensolve may deflate nothing;
        # the apply must still be a sane block preconditioner
        a = poisson_small
        lor, arrow = build_lorasc(a, nparts=4, deflation_tol=1e-12)
        v = rng.standard_normal((a.shape[0], 2))
        w = np.asarray(jax.jit(lor.apply)(jnp.asarray(v)))
        assert w.shape == v.shape
        assert np.all(np.isfinite(w))

    def test_eigsolve_direct_vs_scipy(self, ela_small):
        a, _ = sym_rac_scaling(ela_small)
        arrow = block_arrow_structure(a, 4)
        ap = permute(a, arrow.perm)
        ni = arrow.sep_start
        s = schur_complement_dense(
            ap[:ni, :ni].tocsr(), ap[:ni, ni:].tocsr(),
            ap[ni:, :ni].tocsr(), ap[ni:, ni:].tocsr(),
        )
        agg = ap[ni:, ni:].toarray()
        lam = scipy.linalg.eigh(s, agg, eigvals_only=True)
        # generalized eigenvalues of (S, Agg) lie in (0, 1] for SPD A
        assert lam.min() > 0
        assert lam.max() <= 1.0 + 1e-8

    def test_lanczos_matches_direct_smallest(self, ela_small):
        a, _ = sym_rac_scaling(ela_small)
        arrow = block_arrow_structure(a, 4)
        lor_d, _ = build_lorasc(a, arrow=arrow, deflation_tol=1e-1, eig_method="direct")
        lor_l, _ = build_lorasc(
            a, arrow=arrow, deflation_tol=1e-1, eig_method="lanczos",
            lanczos_ncv=min(arrow.sep_size, 80),
        )
        nd = int(lor_d.sigma.shape[0])
        nl = int(lor_l.sigma.shape[0])
        # Lanczos should find at least the dominant deflation candidates
        assert nl >= min(nd, 3) - 1


class TestLorascSolve:
    def test_ecg_lorasc_elasticity(self, ela_small, rng):
        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        solver = ECGSolver.build(ela_small, opts=opts, precond="lorasc", nparts=4)
        x, info = solver.solve(b)
        assert not info["breakdown"]
        assert _relres(ela_small, x, b) < 1e-5

    def test_lorasc_beats_block_jacobi(self, ela_small, rng):
        # headline property (BASELINE.md Table 4): LORASC iterations ≪ BJ's
        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=4000, variant="odir_fused")
        s_bj = ECGSolver.build(ela_small, opts=opts, precond="block_jacobi", nblocks=4)
        s_lo = ECGSolver.build(ela_small, opts=opts, precond="lorasc", nparts=4)
        x1, i_bj = s_bj.solve(b)
        x2, i_lo = s_lo.solve(b)
        assert _relres(ela_small, x2, b) < 1e-5
        assert i_lo["iters"] < i_bj["iters"], (
            f"LORASC {i_lo['iters']} vs BJ {i_bj['iters']}"
        )

    def test_deflation_count_grows_with_contrast(self):
        from prealps_tpu.core.generators import elasticity3d

        a1, _ = sym_rac_scaling(elasticity3d(4, 4, 4, heterogeneous=False))
        a2, _ = sym_rac_scaling(elasticity3d(4, 4, 4, contrast=1e4))
        l1, _ = build_lorasc(a1, nparts=4)
        l2, _ = build_lorasc(a2, nparts=4)
        n1 = int((np.asarray(l1.sigma) > 0).sum())
        n2 = int((np.asarray(l2.sigma) > 0).sum())
        assert n2 >= n1


class TestDistributedLorasc:
    def test_distributed_lorasc_converges(self, ela_small, rng):
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        solver = DistributedLorascECG.build(ela_small, nshards=4, opts=opts)
        x, info = solver.solve(b)
        assert not info["breakdown"]
        assert _relres(ela_small, x, b) < 1e-5

    def test_distributed_matches_single_device_lorasc(self, ela_small, rng):
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        # exact_schur=False: compare like with like — the single-device path
        # uses deflation, and at this size the auto rule picks exact Schur
        s_dist = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=False
        )
        s_single = ECGSolver.build(ela_small, opts=opts, precond="lorasc", nparts=4)
        x1, i1 = s_dist.solve(b)
        x2, i2 = s_single.solve(b)
        assert _relres(ela_small, x1, b) < 1e-5
        assert _relres(ela_small, x2, b) < 1e-5
        # same algorithm, same partition count: iteration counts close
        assert abs(i1["iters"] - i2["iters"]) <= max(5, 0.3 * i2["iters"])

    def test_distributed_lorasc_beats_bj_iterations(self, ela_small, rng):
        from prealps_tpu.parallel.driver import DistributedECG
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=4000, variant="odir_fused")
        s_lo = DistributedLorascECG.build(ela_small, nshards=4, opts=opts)
        s_bj = DistributedECG.build(ela_small, nshards=4, opts=opts)
        x1, i1 = s_lo.solve(b)
        x2, i2 = s_bj.solve(b)
        assert i1["iters"] < i2["iters"]

    def test_distributed_lorasc_beats_bj_8shards(self, ela_small, rng):
        """The dryrun_multichip configuration (8 shards): LORASC must keep
        the reference's headline property (manual Table 4: 102 vs 4058
        iterations) — round 2 had this inverted (MULTICHIP_r02: 1791 vs
        828) before the exact-Schur fallback for separator-dominated
        partitions landed."""
        from prealps_tpu.parallel.driver import DistributedECG
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=4000, variant="odir_fused")
        s_lo = DistributedLorascECG.build(ela_small, nshards=8, opts=opts)
        s_bj = DistributedECG.build(ela_small, nshards=8, opts=opts)
        x1, i1 = s_lo.solve(b)
        x2, i2 = s_bj.solve(b)
        assert _relres(ela_small, x1, b) < 1e-5
        assert i1["iters"] < i2["iters"], (i1["iters"], i2["iters"])

    def test_banded_agg_matches_dense(self, ela_small, rng):
        """Large-separator regime (the reference's MUMPS role,
        mumps_solver.c:83-90 + lorasc.c:248-257): the RCM block-banded Agg
        factorization must reproduce the dense-inverse path — agg_dense_max
        forces it at test size (separator 208 > 64)."""
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        s_band = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=False,
            agg_dense_max=64,
        )
        s_dense = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=False,
        )
        x1, i1 = s_band.solve(b)
        x2, i2 = s_dense.solve(b)
        assert _relres(ela_small, x1, b) < 1e-5
        assert i1["iters"] == i2["iters"]
        assert s_band.deflated == s_dense.deflated

    def test_deflation_path_still_converges_when_forced(self, ela_small, rng):
        """exact_schur=False pins the Lanczos-deflation path (the at-scale
        configuration) even on matrices where the auto rule picks exact."""
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        s = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=False
        )
        x, info = s.solve(b)
        assert not info["breakdown"]
        assert _relres(ela_small, x, b) < 1e-5


class TestDistributedLorascF32:
    def test_f32_refinement_reaches_tight_tol(self, ela_small, rng):
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-7, maxiter=2000, variant="odir_fused")
        solver = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, dtype=np.float32
        )
        x, info = solver.solve(b)
        assert info.get("refine_rounds", 0) >= 1
        assert _relres(ela_small, x, b) < 1e-5


class TestDistributedDeflateCorrection:
    def test_deflate_matches_sigma_iterations(self, ela_small, rng):
        """Distributed correction="deflate" (BNN projection over the
        device-chunked lift, parallel/lorasc_driver.py) must converge in the
        same iteration class as the σ form and to the same solution."""
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        iters = {}
        for corr in ("sigma", "deflate"):
            s = DistributedLorascECG.build(
                ela_small, nshards=4, opts=opts, exact_schur=False,
                max_deflation=16, correction=corr,
            )
            x, info = s.solve(b)
            assert _relres(ela_small, x, b) < 1e-5, corr
            assert not info["breakdown"]
            iters[corr] = info["iters"]
        assert iters["deflate"] <= 1.25 * iters["sigma"] + 5, iters

    def test_deflate_f32_omin_bounded_iterations(self, ela_small, rng):
        """The driver-environment dryrun regime (f32, x64 off in that
        process): deflate-corrected LORASC with the PRODUCTION variant
        (omin — docs/PERFORMANCE.md round 3: the odir recurrence drifts in
        f32 under this correction) must converge in the deflation-quality
        iteration class, not the drift class. Round-5 incident: path 6 was
        committed with odir_fused and silently ran 4417 iterations in the
        driver env (88 with omin; f64 takes 54 either way) — this pins the
        f32 contract at pytest level so the dryrun isn't the only net."""
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0]).astype(np.float32)
        opts = ECGOptions(t=2, tol=1e-6, maxiter=4000, variant="omin")
        s = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=False,
            max_deflation=16, correction="deflate", dtype=np.float32,
        )
        x, info = s.solve(b)
        assert _relres(ela_small, x, b) < 1e-5
        assert not info["breakdown"]
        # drift regime is O(1000); deflation-quality is O(100) here
        assert info["iters"] < 400, info["iters"]

    def test_deflate_two_level_mesh(self, ela_small, rng):
        """deflate on the ("shards","local") two-level mesh: the Ŵ chunks
        shard over BOTH axes and c1 psums over both."""
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        s = DistributedLorascECG.build(
            ela_small, mesh_shape=(4, 2), opts=opts, exact_schur=False,
            max_deflation=16, correction="deflate",
        )
        x, info = s.solve(b)
        assert _relres(ela_small, x, b) < 1e-5
        assert not info["breakdown"]


class TestExactSchurBanded:
    """Exact-Schur fallback through the BANDED machinery (VERDICT r3 weak
    #5): S = Agg − Σ Agi Aii⁻¹ Aig assembled sparse from part-local boundary
    patches and factored block-banded — no ng² dense array at any ng."""

    def test_exact_schur_banded_converges(self, ela_small, rng):
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        # agg_dense_max=16 forces the banded branch at this problem size
        solver = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=True,
            agg_dense_max=16,
        )
        assert "agg_inv" not in solver._operands[0], \
            "ng² inverse must not exist"
        x, info = solver.solve(b)
        assert not info["breakdown"]
        assert _relres(ela_small, x, b) < 1e-5

    def test_exact_schur_banded_matches_dense_exact_schur(self, ela_small,
                                                          rng):
        """Banded-exact-Schur and dense-exact-Schur are the same
        preconditioner: iteration counts must agree almost exactly."""
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG

        b = rng.standard_normal(ela_small.shape[0])
        opts = ECGOptions(t=2, tol=1e-6, maxiter=2000, variant="odir_fused")
        s_band = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=True,
            agg_dense_max=16,
        )
        s_dense = DistributedLorascECG.build(
            ela_small, nshards=4, opts=opts, exact_schur=True,
        )
        x1, i1 = s_band.solve(b)
        x2, i2 = s_dense.solve(b)
        assert _relres(ela_small, x1, b) < 1e-5
        assert _relres(ela_small, x2, b) < 1e-5
        assert abs(i1["iters"] - i2["iters"]) <= 2, (i1["iters"], i2["iters"])


class TestSinglePartContract:
    def test_distributed_lorasc_rejects_one_part(self):
        """One part has no separator — the block-arrow degenerates (was an
        obscure shape crash, round 5); the reference's LORASC likewise runs
        under mpirun -np >= 2 (README.md:57)."""
        import pytest

        from prealps_tpu.core.generators import elasticity3d
        from prealps_tpu.parallel.lorasc_driver import DistributedLorascECG
        from prealps_tpu.solvers import ECGOptions

        a = elasticity3d(4, 4, 4)
        with pytest.raises(ValueError, match=">= 2 interior parts"):
            DistributedLorascECG.build(
                a, nshards=1, opts=ECGOptions(t=2, tol=1e-6, maxiter=100),
                dtype=np.float64)
