"""Host-side core: matrix IO, scaling, generators, partitioning, layouts.

This layer replaces the reference's CPLM CSR toolkit + METIS/ParMETIS glue
(reference: utils/cplm_core, utils/cplm_light, utils/cplm_v0,
utils/preAlps_utils.c). Everything here runs on the host at setup time and
produces static, device-ready layouts; nothing in this package is traced.
"""

from prealps_tpu.core.io import load_mtx, save_mtx
from prealps_tpu.core.scaling import sym_rac_scaling
from prealps_tpu.core.generators import poisson3d, elasticity3d
from prealps_tpu.core.partition import (
    kway_partition,
    nsplit,
    block_arrow_structure,
    rcm_order,
)
from prealps_tpu.core.layout import RowLayout, build_row_layout

__all__ = [
    "load_mtx",
    "save_mtx",
    "sym_rac_scaling",
    "poisson3d",
    "elasticity3d",
    "kway_partition",
    "nsplit",
    "block_arrow_structure",
    "rcm_order",
    "RowLayout",
    "build_row_layout",
]
