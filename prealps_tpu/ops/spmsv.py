"""spMSV: sparse matrix × sparse multivector product with structure tracking.

(reference: utils/iterativeKernels/spMSV.c preAlps_spMSV — C = A·B where B is
a sparse block multivector, exploiting the block-sparsity of B and switching
to dense storage when the result fills in; used for s-step/CA Krylov basis
construction, not called by ECG — iterativeKernels/README.md:3.)

TPU-native redesign: B is carried DENSE with an explicit block-row support
mask (dense compute is the profitable regime on the MXU — the "switch to
dense when profitable" decision of the reference is taken statically). The
value of spMSV here is the STRUCTURE tracking: the support of A·B is the
block-neighborhood of B's support, computed on the host from the partition
block graph, so callers can skip all-zero panels and predict fill-in across
s-step basis builds.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def block_support_graph(a: sp.spmatrix, offsets: np.ndarray) -> sp.csr_matrix:
    """Block connectivity graph: G[i, j] = 1 iff block row i of A has a
    nonzero in block column j (blocks given by `offsets`)."""
    a = sp.csr_matrix(a)
    nb = len(offsets) - 1
    coo = a.tocoo()
    rb = np.searchsorted(offsets, coo.row, side="right") - 1
    cb = np.searchsorted(offsets, coo.col, side="right") - 1
    g = sp.coo_matrix((np.ones_like(rb), (rb, cb)), shape=(nb, nb))
    g = (g.tocsr() > 0).astype(np.int8)
    return g


def propagate_support(g: sp.csr_matrix, support: np.ndarray, steps: int = 1) -> np.ndarray:
    """Support of G^steps · support (boolean block-row mask)."""
    s = support.astype(np.int8)
    for _ in range(steps):
        s = np.asarray((g @ s) > 0, dtype=np.int8).ravel()
    return s.astype(bool)


def spmsv(a_apply, b: jax.Array, support_mask: jax.Array, offsets: np.ndarray):
    """C = A·B for a block-row-sparse multivector B.

    b: (n, t) dense carrier; support_mask: (nb,) {0,1} per block row of
    `offsets`. Returns (c, new_support_host_fn) where c = A·(B restricted to
    its support). The caller updates the support mask on the host with
    propagate_support.
    """
    nb = len(offsets) - 1
    n, t = b.shape
    row_mask = jnp.repeat(
        support_mask.astype(b.dtype),
        jnp.asarray(np.diff(offsets)),
        total_repeat_length=n,
    )
    return a_apply(b * row_mask[:, None])
