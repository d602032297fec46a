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


def load_partition(path: str, n: int | None = None) -> np.ndarray:
    """Load a row-partition vector: one integer per row (part id; -1 marks
    separator rows for block-arrow preconditioners). Plain text with '%'
    comments — the reference's custom-partitioning-file workflow
    (reference: utils/preAlps_utils.c:168-193, -DMAT_CUSTOM_PARTITIONING_FILE).
    """
    part = np.loadtxt(path, dtype=np.int64, comments="%").ravel()
    if n is not None and part.shape[0] != n:
        raise ValueError(
            f"partition file has {part.shape[0]} entries, matrix has {n} rows"
        )
    return part


def save_partition(path: str, part: np.ndarray) -> None:
    """Write a row-partition vector (one part id per line, '%' header)."""
    part = np.asarray(part, dtype=np.int64).ravel()
    with open(path, "w") as f:
        f.write(f"% prealps_tpu partition: {part.shape[0]} rows, "
                f"{int(part.max()) + 1} parts"
                f"{', separator rows marked -1' if (part < 0).any() else ''}\n")
        np.savetxt(f, part, fmt="%d")
