"""High-level single-device solver API.

The convenience layer matching the reference's example-driver flow
(reference: examples/test_ecg_prealps_op.c and test_lorasc.c): load/scale/
order the operator, build the preconditioner, run ECG, undo the
permutation/scaling. For multi-device runs use parallel.driver.DistributedECG.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from prealps_tpu.core.partition import permute
from prealps_tpu.core.scaling import sym_rac_scaling
from prealps_tpu.ops.formats import csr_to_ell
from prealps_tpu.ops.spmm import ell_spmm
from prealps_tpu.solvers.ecg import ECGOptions, ecg_solve


@dataclass
class ECGSolver:
    """Build once / solve many, single device."""

    opts: ECGOptions
    _perm: Optional[np.ndarray]
    _scale_d: Optional[np.ndarray]
    _fn: object
    _dtype: np.dtype
    n: int = 0

    @classmethod
    def build(
        cls,
        a: sp.spmatrix,
        opts: ECGOptions = ECGOptions(),
        precond: str = "block_jacobi",
        scale: bool = True,
        dtype=None,
        **precond_kwargs,
    ) -> "ECGSolver":
        jax.config.update("jax_default_matmul_precision", "highest")
        a = sp.csr_matrix(a)
        dtype = np.dtype(dtype) if dtype is not None else a.dtype
        scale_d = None
        if scale:
            a, scale_d = sym_rac_scaling(a)

        perm = None
        if precond in ("block_jacobi", "bj"):
            from prealps_tpu.precond.block_jacobi import build_block_jacobi

            m_obj = build_block_jacobi(a, dtype=dtype, **precond_kwargs)
            a_solver = a
        elif precond in ("none", "identity", "noprec"):
            m_obj = None
            a_solver = a
        elif precond == "lorasc":
            from prealps_tpu.precond.lorasc import build_lorasc

            m_obj, arrow = build_lorasc(a, dtype=dtype, **precond_kwargs)
            perm = arrow.perm
            a_solver = permute(a, perm)
        elif precond == "presc":
            from prealps_tpu.precond.presc import build_presc

            m_obj, struct = build_presc(a, dtype=dtype, **precond_kwargs)
            perm = struct.perm
            a_solver = permute(a, perm)
        else:
            raise ValueError(f"unknown preconditioner {precond!r}")

        ell = csr_to_ell(a_solver, dtype=dtype)
        m_apply = m_obj.apply if m_obj is not None else None
        a_apply = lambda x: ell_spmm(ell, x)

        fn = jax.jit(lambda b: ecg_solve(a_apply, m_apply, b, opts))
        return cls(opts=opts, _perm=perm, _scale_d=scale_d, _fn=fn, _dtype=dtype,
                   n=a.shape[0])

    def solve(self, b: np.ndarray):
        b = np.asarray(b)
        b_eff = (self._scale_d * b if self._scale_d is not None else b).astype(self._dtype)
        if self._perm is not None:
            b_eff = b_eff[self._perm]
        res = self._fn(jnp.asarray(b_eff))
        x = np.asarray(res.x)
        if self._perm is not None:
            x_out = np.empty_like(x)
            x_out[self._perm] = x
            x = x_out
        if self._scale_d is not None:
            x = self._scale_d * x
        info = {
            "iters": int(res.iters),
            "res": float(res.res),
            "normb": float(res.normb),
            "bs": int(res.bs),
            "breakdown": bool(res.breakdown),
            "history": np.asarray(res.history),
        }
        return x, info
