"""Device-side numeric kernels: SpMM, CholQR, Lanczos, batched factorizations.

Replaces the reference's MKL BLAS/SpBLAS kernel layer (reference:
utils/cplm_light/cplm_kernels.c) with jnp/XLA ops and Pallas TPU kernels.
"""

from prealps_tpu.ops.formats import (
    EllMatrix,
    BlockEllMatrix,
    csr_to_ell,
    csr_to_block_ell,
)
from prealps_tpu.ops.spmm import ell_spmm, block_ell_spmm, block_ell_spmm_pallas

__all__ = [
    "EllMatrix",
    "BlockEllMatrix",
    "csr_to_ell",
    "csr_to_block_ell",
    "ell_spmm",
    "block_ell_spmm",
    "block_ell_spmm_pallas",
]
