"""Native C++ host library tests (native/graph.cpp, native/mmio.cpp).

Kernel-level verification against the Python/scipy fallbacks
(SURVEY.md §4.3 style: native result re-checked against reference impl).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from prealps_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestNativeGraph:
    def test_kway_balance_and_cut(self, poisson_small):
        k = 8
        part = native.kway_partition(poisson_small, k)
        counts = np.bincount(part, minlength=k)
        assert counts.min() > 0
        assert counts.max() <= int(1.3 * poisson_small.shape[0] / k)
        coo = sp.triu(poisson_small, k=1).tocoo()
        cut = np.count_nonzero(part[coo.row] != part[coo.col])
        assert cut < 0.35 * coo.nnz

    def test_kway_deterministic(self, poisson_small):
        p1 = native.kway_partition(poisson_small, 4)
        p2 = native.kway_partition(poisson_small, 4)
        np.testing.assert_array_equal(p1, p2)

    def test_rcm_valid_permutation_and_bandwidth(self, ela_small):
        perm = native.rcm_order(ela_small)
        assert sorted(perm.tolist()) == list(range(ela_small.shape[0]))
        # quality: no worse than scipy's RCM (natural FEM ordering can beat
        # both — RCM only guarantees a banded profile, not the optimum)
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        p2 = np.asarray(reverse_cuthill_mckee(ela_small, symmetric_mode=True))

        def bw(p):
            ap = ela_small[p][:, p].tocoo()
            return np.abs(ap.row - ap.col).max()

        assert bw(perm) <= bw(p2) * 1.2

    def test_vertex_separator_covers_all_cut_edges(self, ela_small):
        part = native.kway_partition(ela_small, 4)
        in_sep = native.vertex_separator(ela_small, part)
        coo = sp.triu(ela_small, k=1).tocoo()
        cut = part[coo.row] != part[coo.col]
        covered = in_sep[coo.row[cut]] | in_sep[coo.col[cut]]
        assert covered.all(), "separator must cover every cut edge"

    def test_separator_feeds_block_arrow(self, ela_small):
        # end-to-end through block_arrow_structure (which auto-dispatches)
        from prealps_tpu.core.partition import block_arrow_structure, permute

        ba = block_arrow_structure(ela_small, 4)
        ap = permute(ela_small, ba.perm)
        coo = sp.triu(ap.tocoo(), k=1).tocoo()
        off = ba.interior_offsets
        inter = (coo.row < ba.sep_start) & (coo.col < ba.sep_start)
        owner_r = np.searchsorted(off, coo.row[inter], side="right") - 1
        owner_c = np.searchsorted(off, coo.col[inter], side="right") - 1
        assert np.all(owner_r == owner_c)


class TestNativeMM:
    def test_load_matches_scipy(self, tmp_path, rng):
        from prealps_tpu.core.io import load_mtx, save_mtx

        a = sp.random(50, 50, density=0.1, random_state=np.random.RandomState(3)).tocsr()
        path = str(tmp_path / "t.mtx")
        save_mtx(path, a)
        m1 = native.load_mtx(path)
        m2 = load_mtx(path)
        assert abs(m1 - m2).max() < 1e-14

    def test_load_symmetric_expansion(self):
        import os

        path = "/root/reference/matrix/LFAT5.mtx"
        if not os.path.exists(path):
            pytest.skip("LFAT5 not available")
        from prealps_tpu.core.io import load_mtx

        m1 = native.load_mtx(path)
        m2 = load_mtx(path)
        assert abs(m1 - m2).max() < 1e-14
        assert abs(m1 - m1.T).max() == 0
