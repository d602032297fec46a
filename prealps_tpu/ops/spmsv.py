"""spMSV: sparse matrix × sparse multivector product with structure tracking.

(reference: utils/iterativeKernels/spMSV.c preAlps_spMSV — C = A·B where B is
a sparse block multivector; the routine tracks the (a_nparts × b_nparts)
block structure of B and C, skips empty blocks, and switches C to dense when
it fills in; used for s-step/CA Krylov basis construction, not called by ECG
— iterativeKernels/README.md:3.)

TPU-native redesign: values are carried DENSE (n, t) — dense panels are the
profitable regime on the MXU and XLA needs static shapes — while the BLOCK
STRUCTURE is tracked exactly like the reference's ABlockStruct contract
(spMSV.h:57-60):

* `block_support_graph` = the user-precomputed ABlockStruct;
* `spmsv` takes B's (row-block × col-block) support, masks the dead blocks,
  multiplies, and returns C plus its PREDICTED support
  struct(C) = struct(A) · struct(B) (boolean product) and the
  reference's sparse→dense switch decision as a fill-ratio flag
  (spMSV.h options[2] / return code 1);
* across s-step basis builds the support fronts grow by one block
  neighborhood per application (`propagate_support`), so callers know when
  masking stops paying off — the same economics as the reference's dynamic
  reallocation, decided statically.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def block_support_graph(a: sp.spmatrix, offsets: np.ndarray) -> sp.csr_matrix:
    """Block connectivity graph: G[i, j] = 1 iff block row i of A has a
    nonzero in block column j (blocks given by `offsets`) — the
    ABlockStruct the reference requires precomputed (spMSV.h:57-60)."""
    a = sp.csr_matrix(a)
    nb = len(offsets) - 1
    coo = a.tocoo()
    rb = np.searchsorted(offsets, coo.row, side="right") - 1
    cb = np.searchsorted(offsets, coo.col, side="right") - 1
    g = sp.coo_matrix((np.ones_like(rb), (rb, cb)), shape=(nb, nb))
    g = (g.tocsr() > 0).astype(np.int8)
    return g


def propagate_support(g: sp.csr_matrix, support: np.ndarray, steps: int = 1) -> np.ndarray:
    """Support after `steps` applications: struct(G^steps · support).

    support: (nb,) or (nb, k) boolean; returns the same shape."""
    s = support.astype(np.int8)
    for _ in range(steps):
        s = np.asarray((g @ s) > 0, dtype=np.int8)
    return s.astype(bool)


def spmsv(
    a_apply,
    b: jax.Array,
    b_struct: np.ndarray,
    a_block_struct: sp.spmatrix,
    row_offsets: np.ndarray,
    col_offsets: np.ndarray | None = None,
    dense_switch: float = 0.5,
):
    """C = A·B for a block-sparse multivector B with structure tracking.

    b: (n, t) dense carrier. b_struct: host boolean, either (nbr,) — one
    support flag per block row, all columns alike — or (nbr, nbc) with
    col_offsets giving B's column blocks (the reference's b_ncolparts,
    spMSV.h:53-55). a_block_struct: block graph of A (block_support_graph).

    Returns (c, c_struct, is_dense):
      c        = A · (B restricted to its support), (n, t);
      c_struct = predicted support of C (same shape class as b_struct) —
                 struct(A)·struct(B), exact for generic values;
      is_dense = True when c_struct's fill ratio ≥ dense_switch — the
                 reference's sparse→dense switch (spMSV.h return code 1);
                 callers should stop masking from then on.
    """
    n, t = b.shape
    b_struct = np.asarray(b_struct)
    row_sizes = jnp.asarray(np.diff(row_offsets))

    if b_struct.ndim == 1:
        row_mask = jnp.repeat(
            jnp.asarray(b_struct.astype(b.dtype)), row_sizes,
            total_repeat_length=n,
        )
        mask = row_mask[:, None]
    else:
        assert col_offsets is not None, "2-D b_struct needs col_offsets"
        col_sizes = jnp.asarray(np.diff(col_offsets))
        mask = jnp.repeat(
            jnp.asarray(b_struct.astype(b.dtype)), row_sizes, axis=0,
            total_repeat_length=n,
        )
        mask = jnp.repeat(mask, col_sizes, axis=1, total_repeat_length=t)

    c = a_apply(b * mask)
    c_struct = propagate_support(sp.csr_matrix(a_block_struct), b_struct)
    is_dense = bool(np.mean(c_struct) >= dense_switch)
    return c, c_struct, is_dense


def spmsv_chain(
    a_apply,
    b: jax.Array,
    b_struct: np.ndarray,
    a_block_struct: sp.spmatrix,
    row_offsets: np.ndarray,
    steps: int,
    col_offsets: np.ndarray | None = None,
    dense_switch: float = 0.5,
):
    """s-step basis build: [B, AB, A²B, …] with structure tracking; masking
    is dropped once the support fills in (the dense regime). Returns
    (panels list, structs list)."""
    panels, structs = [b], [np.asarray(b_struct)]
    cur, cur_struct = b, np.asarray(b_struct)
    dense = False
    for _ in range(steps):
        if dense:
            cur = a_apply(cur)
            cur_struct = np.ones_like(cur_struct)
        else:
            cur, cur_struct, dense = spmsv(
                a_apply, cur, cur_struct, a_block_struct, row_offsets,
                col_offsets, dense_switch,
            )
        panels.append(cur)
        structs.append(cur_struct)
    return panels, structs
