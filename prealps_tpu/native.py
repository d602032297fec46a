"""ctypes bindings to the native host library (native/libprealps_host.so).

The native library accelerates the setup-time graph algorithms (k-way
partitioning, RCM, vertex-separator extraction, MatrixMarket parsing) that
replace the reference's METIS/ParMETIS + mmio native dependencies. Pure
Python/scipy fallbacks exist for every function (core/partition.py, core/
io.py); `available()` reports whether the .so is loadable, and the library is
built on demand with `make -C native` when a toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np
import scipy.sparse as sp

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libprealps_host.so")

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i8p = np.ctypeslib.ndpointer(dtype=np.int8, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.prealps_kway.argtypes = [
        ctypes.c_int, _i32p, _i32p, ctypes.c_int, ctypes.c_int, _i32p
    ]
    lib.prealps_rcm.argtypes = [ctypes.c_int, _i32p, _i32p, _i32p]
    lib.prealps_vertex_separator.argtypes = [
        ctypes.c_int, _i32p, _i32p, _i32p, _i8p
    ]
    lib.prealps_mm_open.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.prealps_mm_fill.argtypes = [ctypes.c_void_p, _i32p, _i32p, _f64p]
    return lib


def available() -> bool:
    return _lib() is not None


def _adj_int32(a: sp.spmatrix):
    from prealps_tpu.core.partition import _adjacency

    adj = _adjacency(a)
    return adj.indptr.astype(np.int32), adj.indices.astype(np.int32), adj.shape[0]


def kway_partition(a: sp.spmatrix, k: int, refine_passes: int = 8) -> np.ndarray:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    indptr, indices, n = _adj_int32(a)
    part = np.empty(n, dtype=np.int32)
    rc = lib.prealps_kway(n, indptr, indices, k, refine_passes, part)
    if rc:
        raise RuntimeError(f"prealps_kway failed rc={rc}")
    return part.astype(np.int64)


def rcm_order(a: sp.spmatrix) -> np.ndarray:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    indptr, indices, n = _adj_int32(a)
    perm = np.empty(n, dtype=np.int32)
    rc = lib.prealps_rcm(n, indptr, indices, perm)
    if rc:
        raise RuntimeError(f"prealps_rcm failed rc={rc}")
    return perm.astype(np.int64)


def vertex_separator(a: sp.spmatrix, part: np.ndarray) -> np.ndarray:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    indptr, indices, n = _adj_int32(a)
    in_sep = np.empty(n, dtype=np.int8)
    rc = lib.prealps_vertex_separator(
        n, indptr, indices, part.astype(np.int32), in_sep
    )
    if rc:
        raise RuntimeError(f"prealps_vertex_separator failed rc={rc}")
    return in_sep.astype(bool)


def load_mtx(path: str) -> sp.csr_matrix:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    handle = ctypes.c_void_p()
    n = ctypes.c_int64()
    m = ctypes.c_int64()
    nnz = ctypes.c_int64()
    rc = lib.prealps_mm_open(
        path.encode(), ctypes.byref(handle), ctypes.byref(n),
        ctypes.byref(m), ctypes.byref(nnz),
    )
    if rc:
        raise RuntimeError(f"prealps_mm_open failed rc={rc} for {path}")
    row = np.empty(nnz.value, dtype=np.int32)
    col = np.empty(nnz.value, dtype=np.int32)
    val = np.empty(nnz.value, dtype=np.float64)
    lib.prealps_mm_fill(handle, row, col, val)
    csr = sp.coo_matrix((val, (row, col)), shape=(n.value, m.value)).tocsr()
    csr.sum_duplicates()
    csr.sort_indices()
    return csr
