"""Tests for the host core: generators, IO, scaling, partitioning, layouts."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from prealps_tpu.core.generators import elasticity3d, poisson3d
from prealps_tpu.core.partition import (
    block_arrow_structure,
    kway_partition,
    nsplit,
    permute,
    rcm_order,
)
from prealps_tpu.core.layout import (
    build_row_layout,
    pad_to_padded,
    permute_and_pad_matrix,
    real_row_mask,
    unpad_from_padded,
)
from prealps_tpu.core.scaling import sym_rac_scaling


def _is_spd(a):
    a = sp.csr_matrix(a)
    sym_err = abs(a - a.T).max()
    assert sym_err < 1e-10 * abs(a).max()
    np.linalg.cholesky(a.toarray())  # raises if not positive definite


class TestGenerators:
    def test_poisson_spd(self):
        a = poisson3d(5, 4, 3)
        assert a.shape == (60, 60)
        _is_spd(a)

    def test_elasticity_spd(self):
        a = elasticity3d(4, 3, 3)
        # 3 dofs * (5*4*4 nodes - 5*4 clamped) = 3*5*4*3
        assert a.shape[0] == 3 * 5 * 4 * 3
        _is_spd(a)

    def test_elasticity_heterogeneous_range(self):
        a = elasticity3d(4, 3, 3, heterogeneous=True, contrast=1e3)
        b = elasticity3d(4, 3, 3, heterogeneous=False)
        assert a.diagonal().max() / a.diagonal().min() > 50
        assert b.diagonal().max() / b.diagonal().min() < 50

    def test_elasticity_family_size(self):
        # reference family: elasticity3d_12x10x10 -> n=4719 with no BC;
        # ours clamps one face: 3*13*11*10
        a = elasticity3d(12, 10, 10)
        assert a.shape[0] == 4290


class TestScaling:
    def test_sym_rac(self):
        a = elasticity3d(3, 3, 3)
        s, d = sym_rac_scaling(a)
        # row max of |s| must be 1
        rowmax = np.abs(s).max(axis=1).toarray().ravel()
        np.testing.assert_allclose(rowmax, 1.0, rtol=1e-12)
        # s = D A D
        recon = sp.diags(d) @ a @ sp.diags(d)
        assert abs(s - recon).max() < 1e-12
        _is_spd(s)


class TestPartition:
    def test_nsplit(self):
        off = nsplit(10, 3)
        np.testing.assert_array_equal(off, [0, 4, 7, 10])

    def test_kway_balance_and_cut(self, poisson_small):
        k = 8
        part = kway_partition(poisson_small, k)
        counts = np.bincount(part, minlength=k)
        assert counts.min() > 0
        assert counts.max() <= int(1.30 * poisson_small.shape[0] / k)
        # edge cut should be far below total edges
        coo = sp.triu(poisson_small, k=1).tocoo()
        cut = np.count_nonzero(part[coo.row] != part[coo.col])
        assert cut < 0.35 * coo.nnz

    def test_kway_deterministic(self, poisson_small):
        p1 = kway_partition(poisson_small, 4)
        p2 = kway_partition(poisson_small, 4)
        np.testing.assert_array_equal(p1, p2)

    def test_block_arrow(self, ela_small):
        k = 4
        ba = block_arrow_structure(ela_small, k)
        assert ba.sep_size > 0
        assert ba.sep_size < 0.5 * ba.n
        ap = permute(ela_small, ba.perm)
        # interiors of different parts must not couple
        coo = sp.triu(ap.tocoo(), k=1).tocoo()
        off = ba.interior_offsets
        owner_r = np.searchsorted(off, coo.row, side="right") - 1
        owner_c = np.searchsorted(off, coo.col, side="right") - 1
        inter = (coo.row < ba.sep_start) & (coo.col < ba.sep_start)
        assert np.all(owner_r[inter] == owner_c[inter]), "block-arrow violated"

    def test_rcm_reduces_bandwidth(self, poisson_small):
        a = poisson_small
        p = rcm_order(a)
        ap = permute(a, p)
        coo = a.tocoo()
        bw0 = np.abs(coo.row - coo.col).max()
        coo2 = ap.tocoo()
        bw1 = np.abs(coo2.row - coo2.col).max()
        assert bw1 <= bw0


class TestLayout:
    def test_roundtrip(self, ela_small, rng):
        lay = build_row_layout(ela_small, 8)
        x = rng.standard_normal((lay.n, 3))
        xp = pad_to_padded(lay, x)
        assert xp.shape == (lay.n_pad, 3)
        np.testing.assert_array_equal(unpad_from_padded(lay, xp), x)
        # padding rows are zero
        mask = real_row_mask(lay)
        assert np.all(xp[~mask] == 0)

    def test_padded_matrix_spmm(self, ela_small, rng):
        lay = build_row_layout(ela_small, 8)
        apad = permute_and_pad_matrix(ela_small, lay)
        x = rng.standard_normal((lay.n, 2))
        y_ref = ela_small @ x
        y_pad = apad @ pad_to_padded(lay, x)
        np.testing.assert_allclose(unpad_from_padded(lay, y_pad), y_ref, rtol=1e-12)

    def test_deps_subset(self, poisson_small):
        lay = build_row_layout(poisson_small, 8)
        for s, d in enumerate(lay.deps):
            assert s not in d
            assert all(0 <= q < 8 for q in d)


class TestIO:
    def test_vector_roundtrip(self, tmp_path, rng):
        from prealps_tpu.core.io import load_vector, save_vector

        v = rng.standard_normal(57)
        p = str(tmp_path / "v.txt")
        save_vector(p, v)
        v2 = load_vector(p)
        np.testing.assert_allclose(v2, v, rtol=1e-12)

    def test_matrix_roundtrip(self, tmp_path):
        import scipy.sparse as sp

        from prealps_tpu.core.io import load_mtx, save_mtx

        a = sp.random(30, 30, density=0.2, random_state=np.random.RandomState(1)).tocsr()
        p = str(tmp_path / "a.mtx")
        save_mtx(p, a)
        a2 = load_mtx(p)
        assert abs(a - a2).max() < 1e-14
