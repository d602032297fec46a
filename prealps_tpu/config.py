"""Global configuration: dtype policy and platform helpers.

The reference library (NLAFET/preAlps) is float64 everywhere (C99 + MKL).
TPUs are f32/bf16 machines; this framework therefore carries an explicit
dtype policy:

* ``float64`` — bit-comparable correctness path. Used by the CPU test suite
  (`jax_enable_x64`) and available on TPU through XLA's f64 emulation (slow).
* ``float32`` — the TPU fast path. All matmuls request HIGHEST precision
  (true-f32 MXU passes), and tolerances below the f32 attainable floor are
  reached through mixed-precision iterative refinement (f64 residuals on the
  host, f32 inner solves on device — see parallel/driver.DistributedECG).
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
      refine: if True and vec==float32, drivers run mixed-precision
        iterative refinement to reach tolerances below the f32 floor.
    """

    vec: jnp.dtype
    gram: jnp.dtype
    refine: bool = False

    @staticmethod
    def make(dtype=None, refine: bool | None = None) -> "Precision":
        dtype = dtype or default_dtype()
        dtype = jnp.dtype(dtype)
        if refine is None:
            refine = dtype == jnp.float32
        gram = jnp.float64 if dtype == jnp.float64 else jnp.float32
        return Precision(vec=dtype, gram=gram, refine=refine)


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)


# Environment knob mirroring the reference's compile-time flag system
# (reference: make.inc USE_DEBUG / SPARSE_SOLVER_CHOICE): here a plain env var.
DEBUG = bool(int(os.environ.get("PREALPS_TPU_DEBUG", "0")))
