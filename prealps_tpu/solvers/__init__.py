"""Solvers: the Enlarged Conjugate Gradient family."""

from prealps_tpu.solvers.ecg import (
    ECGOptions,
    ECGResult,
    ecg_solve,
    split_rhs,
)

__all__ = ["ECGOptions", "ECGResult", "ecg_solve", "split_rhs"]
