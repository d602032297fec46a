"""Block-banded batched Cholesky (direct/banded.py) vs scipy references."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from prealps_tpu.direct.banded import (
    BandPlan,
    assemble_host,
    block_banded_cholesky,
    block_banded_matvec,
    block_banded_solve,
    from_band,
    plan_block_banded,
    to_band,
)


def _spd_banded(n, band, rng, scale=1.0):
    """Random SPD matrix with half-bandwidth ≤ band."""
    diags = [rng.standard_normal(n) * scale for _ in range(band)]
    a = sp.diags(
        [np.ones(n) * 0.0] + diags,
        offsets=[0] + list(range(1, band + 1)),
        shape=(n, n),
    ).tocsr()
    a = a + a.T
    a = a + sp.eye(n) * (np.abs(a).sum(axis=1).max() + 1.0)
    return sp.csr_matrix(a)


class TestPlanAssemble:
    def test_plan_shapes(self, rng):
        blocks = [_spd_banded(50, 5, rng), _spd_banded(37, 3, rng)]
        plan = plan_block_banded(blocks, order="natural")
        assert plan.nparts == 2
        assert plan.bandwidth <= plan.bs
        assert plan.rows_padded >= 50

    def test_assemble_matches_matrix(self, rng):
        blocks = [_spd_banded(40, 4, rng)]
        plan = plan_block_banded(blocks, bs=8, order="natural")
        d, e = assemble_host(plan, blocks)
        v = rng.standard_normal((40, 3))
        vb = jnp.asarray(to_band(plan, [v]))
        y = block_banded_matvec(jnp.asarray(d), jnp.asarray(e), vb)
        (y_np,) = from_band(plan, y)
        np.testing.assert_allclose(y_np, blocks[0] @ v, rtol=1e-10, atol=1e-10)

    def test_rcm_reduces_bandwidth(self, rng):
        from prealps_tpu.core.generators import poisson3d

        a = poisson3d(6, 6, 6)
        p = rng.permutation(a.shape[0])
        a_shuffled = a[p][:, p].tocsr()
        plan = plan_block_banded([a_shuffled], order="rcm")
        coo = a_shuffled.tocoo()
        raw_bw = int(np.abs(coo.row - coo.col).max())
        assert plan.bandwidth < raw_bw


class TestSolve:
    @pytest.mark.parametrize("sizes", [[64], [50, 63, 40]])
    def test_exact_solve(self, rng, sizes):
        blocks = [_spd_banded(m, 6, rng) for m in sizes]
        plan = plan_block_banded(blocks, order="natural")
        d, e = assemble_host(plan, blocks)
        fac = block_banded_cholesky(jnp.asarray(d), jnp.asarray(e))
        assert not bool(fac.failed)
        vs = [rng.standard_normal((m, 4)) for m in sizes]
        vb = jnp.asarray(to_band(plan, vs))
        w = block_banded_solve(fac, vb)
        for i, w_np in enumerate(from_band(plan, w)):
            x_ref = spla.spsolve(sp.csc_matrix(blocks[i]), vs[i])
            np.testing.assert_allclose(w_np, x_ref, rtol=1e-8, atol=1e-8)

    def test_poisson_interior_rcm(self, rng):
        """A real subdomain: Poisson interior with RCM ordering."""
        from prealps_tpu.core.generators import poisson3d

        a = poisson3d(7, 6, 5)
        plan = plan_block_banded([a], order="rcm")
        d, e = assemble_host(plan, [a])
        fac = block_banded_cholesky(jnp.asarray(d), jnp.asarray(e))
        assert not bool(fac.failed)
        v = rng.standard_normal((a.shape[0], 2))
        w = block_banded_solve(fac, jnp.asarray(to_band(plan, [v])))
        (w_np,) = from_band(plan, w)
        x_ref = spla.spsolve(sp.csc_matrix(a), v)
        np.testing.assert_allclose(w_np, x_ref, rtol=1e-7, atol=1e-8)

    def test_elasticity_subdomains(self, ela_small, rng):
        """Batched factorization of real block-arrow interiors — the LORASC
        Aii role (reference: lorasc.c:222-243)."""
        from prealps_tpu.core.partition import block_arrow_structure, permute

        a = ela_small
        arrow = block_arrow_structure(a, 4)
        ap = permute(a, arrow.perm)
        off = arrow.interior_offsets
        blocks = [
            ap[int(off[i]): int(off[i + 1]), int(off[i]): int(off[i + 1])]
            for i in range(4)
        ]
        plan = plan_block_banded(blocks, order="rcm")
        d, e = assemble_host(plan, blocks)
        fac = block_banded_cholesky(jnp.asarray(d), jnp.asarray(e))
        assert not bool(fac.failed)
        vs = [rng.standard_normal((b.shape[0], 3)) for b in blocks]
        w = block_banded_solve(fac, jnp.asarray(to_band(plan, vs)))
        for i, w_np in enumerate(from_band(plan, w)):
            x_ref = spla.spsolve(sp.csc_matrix(blocks[i]), vs[i])
            err = np.linalg.norm(w_np - x_ref) / np.linalg.norm(x_ref)
            assert err < 1e-8, err

    def test_shift_regularizes(self, rng):
        """A singular block factors cleanly with a diagonal shift."""
        n = 32
        a = _spd_banded(n, 3, rng)
        a = a - sp.eye(n) * float(spla.eigsh(a, k=1, which="SA")[0][0])
        plan = plan_block_banded([sp.csr_matrix(a)], order="natural")
        d, e = assemble_host(plan, [sp.csr_matrix(a)])
        fac = block_banded_cholesky(jnp.asarray(d), jnp.asarray(e), shift=1e-2)
        assert not bool(fac.failed)
        v = rng.standard_normal((n, 1))
        w = block_banded_solve(fac, jnp.asarray(to_band(plan, [v])))
        assert np.all(np.isfinite(np.asarray(w)))


class TestPartialSchur:
    """Exact Schur onto trailing rows (the PARDISO iparm[35]/MUMPS
    listvar_schur role; reference: presc.c:239-241)."""

    @pytest.mark.parametrize("n_schur", [3, 8])
    def test_matches_scipy(self, rng, n_schur):
        from prealps_tpu.direct.banded import block_banded_schur

        sizes = [48, 57]
        blocks = [_spd_banded(m, 5, rng) for m in sizes]
        plan = plan_block_banded(blocks, bs=16, order="natural")
        d, e = assemble_host(plan, blocks)
        schur, bad = block_banded_schur(jnp.asarray(d), jnp.asarray(e), n_schur)
        assert not bool(bad)
        for i, b in enumerate(blocks):
            m = b.shape[0]
            pad = plan.rows_padded
            a_full = np.eye(pad)
            a_full[:m, :m] = b.toarray()
            k = pad - n_schur
            a11, a12 = a_full[:k, :k], a_full[:k, k:]
            s_ref = a_full[k:, k:] - a12.T @ np.linalg.solve(a11, a12)
            np.testing.assert_allclose(
                np.asarray(schur[i]), s_ref, rtol=1e-9, atol=1e-10
            )

    def test_elasticity_subdomain_schur(self, ela_small, rng):
        """Schur of a real subdomain onto its boundary rows, boundary last."""
        from prealps_tpu.core.partition import block_arrow_structure, permute, rcm_order
        from prealps_tpu.direct.banded import block_banded_schur

        a = ela_small
        arrow = block_arrow_structure(a, 4)
        ap = permute(a, arrow.perm)
        ni = arrow.sep_start
        # local block of part 0: interior rows + ALL separator rows appended
        i0, i1 = int(arrow.interior_offsets[0]), int(arrow.interior_offsets[1])
        sep = np.arange(ni, ap.shape[0])
        loc_rows = np.concatenate([np.arange(i0, i1), sep])
        local = ap[loc_rows][:, loc_rows].tocsr()
        m_int = i1 - i0
        n_s = sep.size
        # order: RCM the interior, keep boundary rows last
        p_int = rcm_order(local[:m_int, :m_int])
        order = np.concatenate([p_int, m_int + np.arange(n_s)])
        local_o = local[order][:, order].tocsr()
        plan = plan_block_banded([local_o], order="natural")
        if plan.bs < n_s:  # ensure Schur rows fit the last block
            plan = plan_block_banded([local_o], bs=max(plan.bs, n_s), order="natural")
        d, e = assemble_host(plan, [local_o])
        # pad so trailing rows ARE the separator rows: identity pads sit
        # after them, so ask for pads + separator and slice
        pad = plan.rows_padded - local_o.shape[0]
        schur, bad = block_banded_schur(
            jnp.asarray(d), jnp.asarray(e), n_schur=n_s + pad
        )
        assert not bool(bad)
        s_dev = np.asarray(schur[0])[:n_s, :n_s]
        a11 = local_o[:m_int, :m_int].toarray()
        a12 = local_o[:m_int, m_int:].toarray()
        a22 = local_o[m_int:, m_int:].toarray()
        s_ref = a22 - a12.T @ np.linalg.solve(a11, a12)
        np.testing.assert_allclose(s_dev, s_ref, rtol=1e-8, atol=1e-9)
