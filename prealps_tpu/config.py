"""Global configuration: dtype policy and platform helpers.

The reference library (NLAFET/preAlps) is float64 everywhere (C99 + MKL).
TPUs are f32/bf16 machines; this framework therefore carries an explicit
dtype policy:

* ``float64`` — bit-comparable correctness path. Used by the CPU test suite
  (`jax_enable_x64`) and available on TPU through XLA's f64 emulation (slow).
* ``float32`` — the TPU fast path. Critical reductions (Gram matrices,
  residual norms, CholQR) can optionally run in compensated "double-float"
  arithmetic (see ops/doublefloat.py) to keep enlarged-CG convergence intact
  at tight tolerances.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def default_dtype():
    """float64 when x64 is enabled (CPU tests), else float32 (TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@dataclass(frozen=True)
class Precision:
    """Precision policy threaded through solvers.

    Attributes:
      vec: dtype of the long (n × t) vectors / matrix values.
      gram: dtype used for Gram-matrix accumulation and small factorizations.
      compensated: if True and vec==float32, Gram products and norms use
        two-float (double-float) compensated accumulation.
    """

    vec: jnp.dtype
    gram: jnp.dtype
    compensated: bool = False

    @staticmethod
    def make(dtype=None, compensated: bool | None = None) -> "Precision":
        dtype = dtype or default_dtype()
        dtype = jnp.dtype(dtype)
        if compensated is None:
            compensated = dtype == jnp.float32 and on_tpu()
        gram = jnp.float64 if dtype == jnp.float64 else jnp.float32
        return Precision(vec=dtype, gram=gram, compensated=compensated)


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)


# Environment knob mirroring the reference's compile-time flag system
# (reference: make.inc USE_DEBUG / SPARSE_SOLVER_CHOICE): here a plain env var.
DEBUG = bool(int(os.environ.get("PREALPS_TPU_DEBUG", "0")))
