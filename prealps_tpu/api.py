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
    """Build once / solve many, single device.

    float32 builds with a tolerance below the f32 floor run mixed-precision
    iterative refinement (host-f64 residuals), like DistributedECG."""

    opts: ECGOptions
    _perm: Optional[np.ndarray]
    _scale_d: Optional[np.ndarray]
    _fn: object
    _dtype: np.dtype
    n: int = 0
    target_tol: float = 0.0
    _a_solver: object = None   # scaled+permuted matrix for refinement residuals

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
        target_tol = opts.tol
        refine = dtype == np.float32 and opts.tol < 1e-3
        if refine:
            from dataclasses import replace as _dc_replace

            opts = _dc_replace(opts, tol=1e-3,
                               stall_window=opts.stall_window or 250)
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
                   n=a.shape[0], target_tol=target_tol,
                   _a_solver=a_solver if refine else None)

    def _solve_permuted(self, b_perm: np.ndarray):
        """One device solve in the scaled+permuted space."""
        res = self._fn(jnp.asarray(b_perm.astype(self._dtype)))
        info = {
            "iters": int(res.iters),
            "res": float(res.res),
            "normb": float(res.normb),
            "bs": int(res.bs),
            "breakdown": bool(res.breakdown),
            "history": np.asarray(res.history),
        }
        return np.asarray(res.x).astype(np.float64), info

    def solve(self, b: np.ndarray, max_refine_rounds: int = 8):
        b = np.asarray(b)
        b_eff = (self._scale_d * b if self._scale_d is not None else b).astype(np.float64)
        if self._perm is not None:
            b_eff = b_eff[self._perm]

        if self._a_solver is None:
            x, info = self._solve_permuted(b_eff)
        else:
            a = self._a_solver
            normb = np.linalg.norm(b_eff)
            x = np.zeros_like(b_eff)
            total_iters, rounds = 0, 0
            info = {}
            prev_relres = np.inf
            for _ in range(max_refine_rounds):
                r = b_eff - a @ x
                relres = np.linalg.norm(r) / normb
                if relres <= self.target_tol or relres > 0.9 * prev_relres:
                    break
                prev_relres = relres
                dx, info = self._solve_permuted(r)
                x = x + dx
                total_iters += info["iters"]
                rounds += 1
                if info.get("breakdown"):
                    break
            info = dict(info or {})
            info["iters"] = total_iters
            info["refine_rounds"] = rounds

        if self._perm is not None:
            x_out = np.empty_like(x)
            x_out[self._perm] = x
            x = x_out
        if self._scale_d is not None:
            x = self._scale_d * x
        return x, info
