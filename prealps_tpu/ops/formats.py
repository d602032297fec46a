"""Device sparse-matrix formats with static shapes.

TPU/XLA needs static shapes and regular access; CSR's ragged rows are hostile
to both. Two formats are provided, converted host-side from scipy CSR
(replacing the reference's 4-array MKL CSR, reference:
utils/cplm_light/cplm_kernels.c:620 CPLM_MatCSRKernelGenMatDenseMult):

* ELL: every row padded to the max row length L. vals (n, L), cols (n, L).
  Padding entries have val=0, col=0. Simple, gather-based; the XLA fallback
  path and the CPU test path.

* Block-ELL: rows grouped into bm-row blocks; for each row block, the set of
  bk-wide column blocks containing nonzeros, padded to the max count S.
  blocks (nrb, S, bm, bk), blkcols (nrb, S). This is the MXU-friendly format
  the Pallas SpMM kernel consumes: each (bm, bk) value block multiplies a
  (bk, t) panel slice of X.

Both are registered as pytrees so operators can be closed over in jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMatrix:
    vals: jax.Array  # (n, L)
    cols: jax.Array  # (n, L) int32
    shape: tuple     # (n, ncols)

    def tree_flatten(self):
        return (self.vals, self.cols), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def nnz_capacity(self):
        return self.vals.shape[0] * self.vals.shape[1]


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockEllMatrix:
    blocks: jax.Array   # (nrb, S, bm, bk)
    blkcols: jax.Array  # (nrb, S) int32; padding slots point at block 0 with zero values
    shape: tuple        # (n, ncols) — multiples of bm / bk respectively

    def tree_flatten(self):
        return (self.blocks, self.blkcols), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def bm(self):
        return self.blocks.shape[2]

    @property
    def bk(self):
        return self.blocks.shape[3]

    @property
    def fill_ratio(self):
        """Stored slots / useful nnz — the padding overhead of the format."""
        nnz = np.count_nonzero(np.asarray(self.blocks))
        return self.blocks.size / max(nnz, 1)


def csr_to_ell(a: sp.spmatrix, ncols: int | None = None, dtype=None) -> EllMatrix:
    """Convert CSR to ELL with row padding to the max row length."""
    a = sp.csr_matrix(a)
    n = a.shape[0]
    ncols = ncols if ncols is not None else a.shape[1]
    row_len = np.diff(a.indptr)
    ell_width = max(int(row_len.max()), 1)
    vals = np.zeros((n, ell_width), dtype=dtype or a.dtype)
    cols = np.zeros((n, ell_width), dtype=np.int32)
    # scatter each row's entries into its padded slots
    rows = np.repeat(np.arange(n), row_len)
    slot = np.arange(a.nnz) - np.repeat(a.indptr[:-1], row_len)
    vals[rows, slot] = a.data
    cols[rows, slot] = a.indices
    return EllMatrix(jnp.asarray(vals), jnp.asarray(cols), (n, ncols))


def csr_to_block_ell(
    a: sp.spmatrix, bm: int = 8, bk: int = 128, ncols: int | None = None, dtype=None
) -> BlockEllMatrix:
    """Convert CSR to block-ELL; pads n to a multiple of bm and the column
    dimension to a multiple of bk."""
    a = sp.csr_matrix(a)
    n, m = a.shape
    ncols = ncols if ncols is not None else m
    n_pad = -(-n // bm) * bm
    ncols_pad = -(-ncols // bk) * bk
    nrb = n_pad // bm

    coo = a.tocoo()
    rb = coo.row // bm
    cb = coo.col // bk
    # unique (row-block, col-block) pairs, in order
    pair_key = rb.astype(np.int64) * (ncols_pad // bk) + cb
    order = np.argsort(pair_key, kind="stable")
    keys_sorted = pair_key[order]
    uniq_keys, first_idx = np.unique(keys_sorted, return_index=True)
    # slot index of each pair within its row block
    uniq_rb = (uniq_keys // (ncols_pad // bk)).astype(np.int64)
    uniq_cb = (uniq_keys % (ncols_pad // bk)).astype(np.int64)
    counts_per_rb = np.bincount(uniq_rb, minlength=nrb)
    s_max = max(int(counts_per_rb.max() if counts_per_rb.size else 0), 1)
    slot_of_uniq = np.arange(uniq_keys.size) - np.concatenate(
        [[0], np.cumsum(counts_per_rb)]
    )[uniq_rb]

    blocks = np.zeros((nrb, s_max, bm, bk), dtype=dtype or a.dtype)
    blkcols = np.zeros((nrb, s_max), dtype=np.int32)
    blkcols[uniq_rb, slot_of_uniq] = uniq_cb

    # map every nnz to (rb, slot, local_row, local_col)
    key_to_slot_idx = np.searchsorted(uniq_keys, pair_key)
    slot = slot_of_uniq[key_to_slot_idx]
    blocks[rb, slot, coo.row % bm, coo.col % bk] = coo.data

    return BlockEllMatrix(jnp.asarray(blocks), jnp.asarray(blkcols), (n_pad, ncols_pad))
