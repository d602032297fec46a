"""MatrixMarket IO (host side).

Replaces the reference's loader (reference: utils/cplm_light/cplm_matcsr.c
CPLM_LoadMatrixMarket and utils/iterativeKernels mmio) with scipy-backed
readers plus a small writer. Always returns CSR with sorted indices; symmetric
files are expanded to full storage, matching the reference's behaviour for
SPD systems.
"""

from __future__ import annotations

import numpy as np
import scipy.io
import scipy.sparse as sp


def load_mtx(path: str, dtype=np.float64) -> sp.csr_matrix:
    """Load a MatrixMarket file into CSR (symmetric files expanded)."""
    mat = scipy.io.mmread(path)  # coo, symmetric already expanded by scipy
    csr = sp.csr_matrix(mat, dtype=dtype)
    csr.sum_duplicates()
    csr.sort_indices()
    return csr


def save_mtx(path: str, a: sp.spmatrix, comment: str = "") -> None:
    scipy.io.mmwrite(path, sp.coo_matrix(a), comment=comment)


def load_vector(path: str, dtype=np.float64) -> np.ndarray:
    """Load a dense vector stored either as MatrixMarket array or plain text.

    (reference: utils/preAlps_doublevector.c load/save use plain text.)
    """
    try:
        v = scipy.io.mmread(path)
        return np.asarray(v, dtype=dtype).ravel()
    except Exception:
        return np.loadtxt(path, dtype=dtype).ravel()


def save_vector(path: str, v: np.ndarray) -> None:
    np.savetxt(path, np.asarray(v).ravel())
