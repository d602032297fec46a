"""Symmetric row/column equilibration.

Matches the reference's symmetric RAC scaling semantics
(reference: utils/cplm_light/cplm_matcsr.c:1461 CPLM_MatCSRSymRACScaling):
scale A' = D A D with D_ii = 1/sqrt(max_j |a_ij|). For SPD matrices this is a
symmetric equilibration that keeps A' SPD with unit-ish diagonal.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def sym_rac_scaling(a: sp.csr_matrix):
    """Return (A_scaled, d) with A_scaled = diag(d) @ A @ diag(d).

    Raises if a row is entirely zero (matching the reference's abort).
    """
    a = a.tocsr()
    rowmax = np.zeros(a.shape[0], dtype=a.dtype)
    # maximum |a_ij| per row
    absa = np.abs(a.data)
    for_rows = np.repeat(np.arange(a.shape[0]), np.diff(a.indptr))
    np.maximum.at(rowmax, for_rows, absa)
    if np.any(rowmax == 0):
        raise ValueError("cannot scale: matrix has an empty row (rcmin=0)")
    d = 1.0 / np.sqrt(rowmax)
    dmat = sp.diags(d)
    scaled = (dmat @ a @ dmat).tocsr()
    scaled.sort_indices()
    return scaled, d
