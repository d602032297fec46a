"""Preconditioners: identity, block Jacobi, LORASC, PRESC.

(reference: src/preconditioners/* with the tagged-union dispatch in
preAlps_preconditioner.c — here: a simple Protocol, every preconditioner is a
pytree exposing .apply.)
"""

from prealps_tpu.precond.api import Preconditioner, Identity, make_preconditioner
from prealps_tpu.precond.block_jacobi import BlockJacobi, build_block_jacobi

__all__ = [
    "Preconditioner",
    "Identity",
    "make_preconditioner",
    "BlockJacobi",
    "build_block_jacobi",
]
