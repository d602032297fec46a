"""Single-chip ECG + scalable LORASC driver for stencil operators.

The production LORASC path at benchmark scale (reference analog:
examples/test_lorasc.c driving lorasc.c): the ECG loop runs on the
lane-major stencil fast path in ORIGINAL ordering; the preconditioner
(precond/lorasc_scale.py) works in arrow coordinates internally via
node-level gathers. One jitted function per solve; float32 + host-f64
iterative refinement on TPU.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from prealps_tpu.core.scaling import sym_rac_scaling
from prealps_tpu.precond.lorasc_scale import ScalableLorasc, build_scalable_lorasc
from prealps_tpu.solvers.ecg import ECGOptions
from prealps_tpu.solvers.refine import refine_solve


@dataclass
class StencilLorascECG:
    """Build once, solve many. See module docstring."""

    n: int
    br: int
    nrb: int
    opts: ECGOptions
    scale_d: Optional[np.ndarray]
    precond: ScalableLorasc
    _fn: object
    target_tol: float = 0.0
    a_scaled: object = None

    @classmethod
    def build(
        cls,
        a: sp.spmatrix,
        nparts: int = 8,
        br: int = 3,
        grid: tuple[int, int, int] | None = None,
        opts: ECGOptions = ECGOptions(layout="tbn"),
        deflation_tol: float = 1e-2,
        max_deflation: int = 64,
        ncv: int | None = None,
        scale: bool = True,
        dtype=None,
        refine: Optional[bool] = None,
        inner_tol: float = 1e-3,
        shift: float = 0.0,
        pencil: str = "agg",   # "sloc" = scalable PRESC (SSLOC pencil,
                               # reference presc.h:18-21)
        host_refine: bool | None = None,  # f64 host refinement of the
                               # deflation pairs (None = auto: f32 + agg)
        correction: str = "sigma",  # "sigma" (reference E σ Eᵀ form) or
                               # "deflate" (balancing/BNN projection —
                               # f32-robust, see lorasc_scale.lorasc_apply)
        restarts: int = 5,     # thick-restart Lanczos cycles − 1
        node_part=None,        # pinned node partition (part id per node,
                               # -1 = separator; preAlps_utils.c:168-193)
        in_sep=None,
    ) -> "StencilLorascECG":
        # true-f32 MXU passes (bf16 default silently breaks CG orthogonality)
        jax.config.update("jax_default_matmul_precision", "highest")
        if opts.layout != "tbn":
            raise ValueError("StencilLorascECG requires layout='tbn'")
        a = sp.csr_matrix(a)
        dtype = np.dtype(dtype) if dtype is not None else a.dtype
        scale_d = None
        if scale:
            a, scale_d = sym_rac_scaling(a)
        target_tol = opts.tol
        if refine is None:
            refine = dtype == np.float32 and opts.tol < inner_tol
        if refine:
            from dataclasses import replace as _dc_replace

            opts = _dc_replace(
                opts, tol=inner_tol, stall_window=opts.stall_window or 250
            )

        from prealps_tpu.ops.formats import csr_to_stencil_bsr_t

        a_t = csr_to_stencil_bsr_t(a, br=br, dtype=dtype)
        if a_t is None:
            raise ValueError(
                "matrix is not stencil-structured; use DistributedLorascECG"
            )
        precond = build_scalable_lorasc(
            a, nparts=nparts, br=br, grid=grid,
            deflation_tol=deflation_tol, max_deflation=max_deflation,
            ncv=ncv, dtype=dtype, shift=shift, a_stencil=a_t,
            pencil=pencil, host_refine=host_refine, correction=correction,
            restarts=restarts, node_part=node_part, in_sep=in_sep,
        )

        n = a.shape[0]
        nrb = n // br

        fn = _compile_ecg_fns(precond.plan, opts, n, br)
        obj = cls(
            n=n, br=br, nrb=nrb, opts=opts, scale_d=scale_d, precond=precond,
            _fn=fn, target_tol=target_tol, a_scaled=a if refine else None,
        )
        obj._m_ops = precond.operands
        return obj

    def with_tol(self, tol: float, inner_tol: float = 1e-3,
                 refine: Optional[bool] = None) -> "StencilLorascECG":
        """A solver at a different target tolerance SHARING this built
        preconditioner (the LORASC build is tolerance-independent; only the
        ECG loop needs re-tracing). The BASELINE.md deep-tolerance record
        rides this instead of paying a second build."""
        from dataclasses import replace as _dc_replace

        dtype = np.asarray(self.precond.operands["sep_mask"]).dtype
        if refine is None:
            refine = dtype == np.float32 and tol < inner_tol
        if refine and self.a_scaled is None:
            raise ValueError("refined with_tol() needs a_scaled from a "
                             "refined original build")
        opts = _dc_replace(
            self.opts, tol=inner_tol if refine else tol,
            stall_window=self.opts.stall_window or (250 if refine else 0),
        )
        fn = _compile_ecg_fns(self.precond.plan, opts, self.n, self.br)
        obj = StencilLorascECG(
            n=self.n, br=self.br, nrb=self.nrb, opts=opts,
            scale_d=self.scale_d, precond=self.precond, _fn=fn,
            target_tol=tol, a_scaled=self.a_scaled if refine else None,
        )
        obj._m_ops = self.precond.operands
        return obj

    def _solve_scaled_once(self, b_eff: np.ndarray):
        # (jitted fns built by _compile_ecg_fns below)
        from prealps_tpu.solvers.ecg import ecg_finalize

        init, step = self._fn
        opts = self.opts
        dtype = np.asarray(self.precond.operands["sep_mask"]).dtype
        b_lane = np.ascontiguousarray(
            b_eff.astype(dtype).reshape(self.nrb, self.br).T
        )
        state, normb = init(jnp.asarray(b_lane), self._m_ops)
        normb_f = float(normb)
        tol_abs = opts.tol * normb_f
        prev_it = -1
        while True:
            state, flags = step(state, normb, self._m_ops)
            it, res_now, brk, bs, stall = np.asarray(flags)
            it = int(it)
            if (res_now <= tol_abs or it >= opts.maxiter or brk or bs <= 0
                    or (opts.stall_window > 0 and stall >= opts.stall_window)
                    or it == prev_it):
                break
            prev_it = it
        res = ecg_finalize(state, normb, opts.layout)
        # scalars come from the already-fetched chunk flags — every extra
        # device fetch is a tunnel round trip (docs/PERFORMANCE.md)
        x = np.ascontiguousarray(np.asarray(res.x).T).reshape(-1)
        info = {
            "iters": it, "res": float(res_now),
            "normb": normb_f, "breakdown": bool(brk),
            "deflated": self.precond.deflated,
        }
        return x.astype(np.float64), info

    def solve(self, b: np.ndarray, max_refine_rounds: int = 8):
        b = np.asarray(b)
        b_eff = self.scale_d * b if self.scale_d is not None else b.astype(np.float64)
        if self.a_scaled is None:
            x, info = self._solve_scaled_once(b_eff)
        else:
            x, info = refine_solve(
                self.a_scaled, b_eff, self._solve_scaled_once,
                self.target_tol, max_rounds=max_refine_rounds,
            )
            info["deflated"] = self.precond.deflated
        if self.scale_d is not None:
            x = self.scale_d * x
        return x, info


def _compile_ecg_fns(plan, opts: ECGOptions, n: int, br: int):
    """Jitted (init, step) for the chunked ECG loop over the stencil fast
    path with the scalable-LORASC apply.

    Operands go in as jit ARGUMENTS — closing over them would embed the
    multi-GB factor arrays as constants in the lowered module. The solve
    runs in CHUNKS of bounded device dispatches with a scalars-only host
    sync between them: long single while_loop dispatches are where the
    remote-attach TPU worker flakes, and chunking also gives live iteration
    progress."""
    import jax.numpy as jnp

    from prealps_tpu.ops.spmm import stencil_bsr_spmm_t
    from prealps_tpu.precond.lorasc_scale import lorasc_apply
    from prealps_tpu.solvers.ecg import ecg_init, ecg_run

    nrb = n // br
    t = opts.t
    r_idx = jnp.arange(nrb)[None, :]
    k_idx = jnp.arange(br)[:, None]
    grow = r_idx * br + k_idx
    assign = ((grow * t) // n).astype(jnp.int32)
    chunk = int(os.environ.get("PREALPS_LORASC_CHUNK", "400"))

    def _aap(m_ops):
        return lambda x: stencil_bsr_spmm_t(m_ops["a_stencil"], x)

    def _map(m_ops):
        return lambda r: lorasc_apply(plan, m_ops, r)

    def init(b, m_ops):
        return ecg_init(_aap(m_ops), _map(m_ops), b, opts,
                        split_assign=assign)

    def step(s, nb, m_ops):
        s = ecg_run(_aap(m_ops), _map(m_ops), s, nb, opts,
                    max_steps=chunk)
        return s, jnp.stack([
            s.it.astype(jnp.float32), s.res.astype(jnp.float32),
            s.breakdown.astype(jnp.float32),
            jnp.sum(s.mask).astype(jnp.float32),
            s.stall.astype(jnp.float32),
        ])

    return (jax.jit(init), jax.jit(step))
