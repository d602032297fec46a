"""Distributed ECG + LORASC driver.

(reference: examples/test_lorasc.c + src/preconditioners/lorasc.c multilevel
apply, lorasc.c:368-618.) TPU-native distribution:

* block-arrow structure with nshards interior parts (host, core/partition.py);
* each shard owns [its interior part ∥ its separator slice] — the same row
  contract as the reference's per-rank layout (preAlps_utils.c:417-497
  separator split), padded to uniform static shapes;
* apply = local batched-Cholesky interior solves + ONE psum of the (ng × t)
  separator right-hand side + replicated small dense Agg solve and low-rank
  correction (the reference's rooted Reduce/Bcast pair becomes psum +
  replicated compute — no root bottleneck, no broadcast);
* the ECG loop itself is the standard shard_map program (psum reductions).

The reference's two comm levels (masterLevel/localLevel MPI splits,
preAlps_utils.c:687) collapse here into mesh axes: this driver uses a 1-D
mesh; on multi-pod deployments the same code runs with the separator psum
scoped to the outer (DCN) axis and interior solves on the inner (ICI) axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from prealps_tpu.core.partition import block_arrow_structure, nsplit, permute, rcm_order
from prealps_tpu.core.scaling import sym_rac_scaling
from prealps_tpu.parallel.mesh import make_mesh
from prealps_tpu.precond.lorasc import schur_complement_dense
from prealps_tpu.solvers.ecg import ECGOptions, ecg_solve

AXIS = "shards"


def _ell_arrays(a: sp.spmatrix, width: int, dtype):
    """ELL arrays with a FIXED width (uniform across shards)."""
    a = sp.csr_matrix(a)
    n = a.shape[0]
    row_len = np.diff(a.indptr)
    w = max(width, 1)
    vals = np.zeros((n, w), dtype=dtype)
    cols = np.zeros((n, w), dtype=np.int32)
    rows = np.repeat(np.arange(n), row_len)
    slot = np.arange(a.nnz) - np.repeat(a.indptr[:-1], row_len)
    vals[rows, slot] = a.data
    cols[rows, slot] = a.indices
    return vals, cols


@dataclass
class DistributedLorascECG:
    """ECG with distributed LORASC. Build once, solve many."""

    nshards: int
    ni_max: int
    ng_max: int
    n: int
    scale_d: Optional[np.ndarray]
    arrow_perm: np.ndarray       # arrow position -> original row
    row_of: np.ndarray           # padded global position -> original row (-1 pad)
    opts: ECGOptions
    deflated: int
    _fn: object
    _operands: tuple
    target_tol: float = 0.0
    a_scaled: object = None

    @classmethod
    def build(
        cls,
        a: sp.spmatrix,
        nshards: Optional[int] = None,
        opts: ECGOptions = ECGOptions(),
        deflation_tol: float = 1e-2,
        max_deflation: int = 64,
        scale: bool = True,
        dtype=None,
        refine: Optional[bool] = None,
        inner_tol: float = 1e-3,
    ) -> "DistributedLorascECG":
        # f32 solves need true-f32 MXU passes: default (bf16) matmul
        # precision inside the small factorizations silently breaks CG
        # orthogonality on TPU (HIGHEST is a no-op on CPU/f64).
        jax.config.update("jax_default_matmul_precision", "highest")
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

            # inner solves: stop on stagnation (an early stop just hands the
            # remaining work to the next refinement round)
            opts = _dc_replace(
                opts, tol=inner_tol,
                stall_window=opts.stall_window or 250,
            )
        mesh = make_mesh(nshards, AXIS)
        nshards = mesh.devices.size
        n = a.shape[0]

        # --- block-arrow structure, one interior part per shard ---
        arrow = block_arrow_structure(a, nshards)
        ap = permute(a, arrow.perm)
        ni_tot, ng_tot = arrow.sep_start, arrow.sep_size
        off = arrow.interior_offsets

        # separator slices per shard (reference: CPLM_nsplit split)
        sep_off = nsplit(ng_tot, nshards)
        ni_max = int(np.diff(off).max())
        ng_max = int(np.diff(sep_off).max())
        ng_pad = ng_max * nshards

        # --- per-shard padded row map: [interior_p | sep slice_p] ---
        rows_per_shard = ni_max + ng_max
        n_pad = rows_per_shard * nshards
        row_of = np.full(n_pad, -1, dtype=np.int64)  # padded pos -> arrow pos
        for s in range(nshards):
            i0, i1 = int(off[s]), int(off[s + 1])
            base = s * rows_per_shard
            row_of[base: base + (i1 - i0)] = np.arange(i0, i1)
            g0, g1 = int(sep_off[s]), int(sep_off[s + 1])
            row_of[base + ni_max: base + ni_max + (g1 - g0)] = ni_tot + np.arange(g0, g1)

        # padded separator indexing: padded sep pos = s*ng_max + j
        sep_pad_of = np.full(ng_pad, -1, dtype=np.int64)  # padded sep -> arrow sep idx
        for s in range(nshards):
            g0, g1 = int(sep_off[s]), int(sep_off[s + 1])
            sep_pad_of[s * ng_max: s * ng_max + (g1 - g0)] = np.arange(g0, g1)

        # --- the padded operator in per-shard row order (for the ECG SpMM) ---
        arrow_to_pad = np.full(n + 1, n_pad, dtype=np.int64)  # arrow pos -> padded pos
        real = row_of >= 0
        arrow_to_pad[row_of[real]] = np.flatnonzero(real)
        coo = ap.tocoo()
        rows = arrow_to_pad[coo.row]
        colsg = arrow_to_pad[coo.col]
        pad_rows = np.flatnonzero(~real)
        data = np.concatenate([coo.data, np.ones(pad_rows.size, dtype=coo.data.dtype)])
        rows = np.concatenate([rows, pad_rows])
        colsg = np.concatenate([colsg, pad_rows])
        a_pad = sp.coo_matrix((data, (rows, colsg)), shape=(n_pad, n_pad)).tocsr()
        ell_w = int(np.diff(a_pad.indptr).max())
        ell_vals, ell_cols = _ell_arrays(a_pad, ell_w, dtype)

        # --- LORASC pieces ---
        aii = ap[:ni_tot, :ni_tot]
        aig = ap[:ni_tot, ni_tot:]
        agi = ap[ni_tot:, :ni_tot]
        agg = ap[ni_tot:, ni_tot:]

        # interior factors: one dense block per shard (RCM-ordered),
        # stored as explicit inverse for the GEMM fast path on device
        aii_inv = np.zeros((nshards, ni_max, ni_max), dtype=dtype)
        int_perm = np.empty(ni_tot, dtype=np.int64)  # arrow interior -> rcm order
        for s in range(nshards):
            i0, i1 = int(off[s]), int(off[s + 1])
            sub = aii[i0:i1, i0:i1]
            p = rcm_order(sub) if (i1 - i0) > 2 else np.arange(i1 - i0)
            int_perm[i0:i1] = i0 + p
            dense = np.eye(ni_max)
            dense[: i1 - i0, : i1 - i0] = sub[p][:, p].toarray()
            aii_inv[s] = np.linalg.inv(dense).astype(dtype)
        # NOTE: interior rows inside each shard keep their arrow order in the
        # padded operator; the factor uses RCM order internally, so the apply
        # permutes in/out with int_perm (per-shard local indices).
        int_local_perm = np.zeros((nshards, ni_max), dtype=np.int32)
        for s in range(nshards):
            i0, i1 = int(off[s]), int(off[s + 1])
            loc = int_perm[i0:i1] - i0
            int_local_perm[s, : i1 - i0] = loc
            int_local_perm[s, i1 - i0:] = np.arange(i1 - i0, ni_max)
        int_local_inv = np.argsort(int_local_perm, axis=1).astype(np.int32)

        # Agi per shard: rows = padded separator (replicated), cols = local
        # interior of shard s
        l_agi = 1
        agi_parts = []
        for s in range(nshards):
            i0, i1 = int(off[s]), int(off[s + 1])
            blk = agi[:, i0:i1].tocsr()
            l_agi = max(l_agi, int(np.diff(blk.indptr).max()) if blk.nnz else 1)
            agi_parts.append(blk)
        agi_vals = np.zeros((nshards, ng_pad, l_agi), dtype=dtype)
        agi_cols = np.zeros((nshards, ng_pad, l_agi), dtype=np.int32)
        for s, blk in enumerate(agi_parts):
            v, c = _ell_arrays(blk, l_agi, dtype)
            # scatter rows into padded separator positions
            arrow_sep_to_pad = np.full(ng_tot, 0, dtype=np.int64)
            realg = sep_pad_of >= 0
            arrow_sep_to_pad[sep_pad_of[realg]] = np.flatnonzero(realg)
            agi_vals[s, arrow_sep_to_pad] = v
            agi_cols[s, arrow_sep_to_pad] = c

        # Aig per shard: rows = local interior, cols = padded separator
        arrow_sep_to_pad = np.full(ng_tot, 0, dtype=np.int64)
        realg = sep_pad_of >= 0
        arrow_sep_to_pad[sep_pad_of[realg]] = np.flatnonzero(realg)
        l_aig = 1
        aig_parts = []
        for s in range(nshards):
            i0, i1 = int(off[s]), int(off[s + 1])
            blk = aig[i0:i1, :].tocsr()
            l_aig = max(l_aig, int(np.diff(blk.indptr).max()) if blk.nnz else 1)
            aig_parts.append(blk)
        aig_vals = np.zeros((nshards, ni_max, l_aig), dtype=dtype)
        aig_cols = np.zeros((nshards, ni_max, l_aig), dtype=np.int32)
        for s, blk in enumerate(aig_parts):
            v, c = _ell_arrays(blk, l_aig, dtype)
            aig_vals[s, : v.shape[0]] = v
            aig_cols[s, : v.shape[0]] = arrow_sep_to_pad[c.ravel()].reshape(c.shape)

        # Agg (padded) dense inverse-free Cholesky + deflation (host)
        agg_pad = np.eye(ng_pad)
        agg_dense = agg.toarray()
        idx = np.flatnonzero(realg)
        agg_pad[np.ix_(idx, idx)] = agg_dense[np.ix_(sep_pad_of[realg], sep_pad_of[realg])]
        agg_chol = np.linalg.cholesky(agg_pad)

        s_dense = schur_complement_dense(
            aii.tocsr(), aig.tocsr(), agi.tocsr(), agg.tocsr()
        )
        import scipy.linalg

        lam, vecs = scipy.linalg.eigh(s_dense, agg_dense)
        sel = np.flatnonzero(lam <= deflation_tol)[:max_deflation]
        if sel.size == 0:
            e_pad = np.zeros((ng_pad, 1))
            sigma = np.zeros((1,))
        else:
            e_pad = np.zeros((ng_pad, sel.size))
            e_pad[idx] = vecs[:, sel][sep_pad_of[realg]]
            sigma = (deflation_tol - lam[sel]) / lam[sel]

        # --- device operands ---
        operands = dict(
            ell_vals=jnp.asarray(ell_vals), ell_cols=jnp.asarray(ell_cols),
            aii_inv=jnp.asarray(aii_inv),
            int_perm=jnp.asarray(int_local_perm), int_inv=jnp.asarray(int_local_inv),
            agi_vals=jnp.asarray(agi_vals), agi_cols=jnp.asarray(agi_cols),
            aig_vals=jnp.asarray(aig_vals), aig_cols=jnp.asarray(aig_cols),
            agg_chol=jnp.asarray(agg_chol.astype(dtype)),
            e_mat=jnp.asarray(e_pad.astype(dtype)),
            sigma=jnp.asarray(sigma.astype(dtype)),
        )
        specs = dict(
            ell_vals=P(AXIS, None), ell_cols=P(AXIS, None),
            aii_inv=P(AXIS, None, None),
            int_perm=P(AXIS, None), int_inv=P(AXIS, None),
            agi_vals=P(AXIS, None, None), agi_cols=P(AXIS, None, None),
            aig_vals=P(AXIS, None, None), aig_cols=P(AXIS, None, None),
            agg_chol=P(), e_mat=P(), sigma=P(),
        )

        def local_solve(b_loc, ops_d):
            t = opts.t

            def a_apply(x_loc):
                x_full = jax.lax.all_gather(x_loc, AXIS, axis=0, tiled=True)
                gathered = x_full[ops_d["ell_cols"]]
                return jnp.einsum("ml,mlt->mt", ops_d["ell_vals"], gathered,
                                  precision=jax.lax.Precision.HIGHEST)

            def aii_solve(vi):
                # vi: (ni_max, t); RCM-permute, one dense GEMM, permute back
                vp = vi[ops_d["int_perm"][0]]
                w = jnp.einsum("ij,jt->it", ops_d["aii_inv"][0], vp,
                               precision=jax.lax.Precision.HIGHEST)
                return w[ops_d["int_inv"][0]]

            def m_apply(v):
                # v: (ni_max + ng_max, t) local rows [interior | sep slice]
                vi, vg = v[:ni_max], v[ni_max:]
                zi = aii_solve(vi)
                # separator rhs: g = vg_scatter − Agi zi  (ONE psum)
                agiz = jnp.einsum(
                    "gl,glt->gt", ops_d["agi_vals"][0], zi[ops_d["agi_cols"][0]],
                    precision=jax.lax.Precision.HIGHEST,
                )
                s_idx = jax.lax.axis_index(AXIS)
                g0 = (s_idx * ng_max).astype(jnp.int32)
                z0 = jnp.int32(0)
                g_local = -agiz
                g_local = jax.lax.dynamic_update_slice(
                    g_local,
                    vg + jax.lax.dynamic_slice(g_local, (g0, z0), (ng_max, t)),
                    (g0, z0),
                )
                g = jax.lax.psum(g_local, AXIS)
                # replicated: zg = Agg⁻¹ g + E σ Eᵀ g
                corr = jnp.einsum("gk,gt->kt", ops_d["e_mat"], g,
                                  precision=jax.lax.Precision.HIGHEST)
                corr = corr * ops_d["sigma"][:, None]
                y = jax.lax.linalg.triangular_solve(
                    ops_d["agg_chol"], g, left_side=True, lower=True)
                zg = jax.lax.linalg.triangular_solve(
                    ops_d["agg_chol"], y, left_side=True, lower=True, transpose_a=True)
                zg = zg + jnp.einsum("gk,kt->gt", ops_d["e_mat"], corr,
                                     precision=jax.lax.Precision.HIGHEST)
                # back-substitution
                aigz = jnp.einsum(
                    "il,ilt->it", ops_d["aig_vals"][0], zg[ops_d["aig_cols"][0]],
                    precision=jax.lax.Precision.HIGHEST,
                )
                wi = zi - aii_solve(aigz)
                wg = jax.lax.dynamic_slice(zg, (g0, z0), (ng_max, t))
                return jnp.concatenate([wi, wg], axis=0)

            s_idx = jax.lax.axis_index(AXIS)
            gpos = s_idx * rows_per_shard + jnp.arange(rows_per_shard)
            assign = ((gpos * t) // n_pad).astype(jnp.int32)
            return ecg_solve(a_apply, m_apply, b_loc, opts,
                             axis_name=AXIS, split_assign=assign)

        from prealps_tpu.parallel.driver import _result_spec_tree

        out_specs = jax.tree_util.tree_map(lambda _: P(), _result_spec_tree())
        out_specs = out_specs._replace(x=P(AXIS))
        in_specs = (P(AXIS), specs)
        fn = jax.jit(
            _shard_map(local_solve, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        )
        return cls(
            nshards=nshards, ni_max=ni_max, ng_max=ng_max, n=n,
            scale_d=scale_d, arrow_perm=arrow.perm, row_of=row_of,
            opts=opts, deflated=int(sel.size), _fn=fn, _operands=(operands,),
            target_tol=target_tol, a_scaled=a if refine else None,
        )

    def solve(self, b: np.ndarray, max_refine_rounds: int = 8):
        b = np.asarray(b)
        if self.a_scaled is not None:
            # mixed-precision refinement on the scaled system (f32 devices)
            b_eff = self.scale_d * b if self.scale_d is not None else b.astype(np.float64)
            normb = np.linalg.norm(b_eff)
            x = np.zeros_like(b_eff)
            total_iters, rounds = 0, 0
            info = {}
            prev_relres = np.inf
            for _ in range(max_refine_rounds):
                r = b_eff - self.a_scaled @ x
                relres = np.linalg.norm(r) / normb
                if relres <= self.target_tol or relres > 0.9 * prev_relres:
                    break
                prev_relres = relres
                dx, info = self._solve_scaled_once(r)
                x = x + dx
                total_iters += info["iters"]
                rounds += 1
                if info.get("breakdown"):
                    break
            info = dict(info or {})
            info["iters"] = total_iters
            info["refine_rounds"] = rounds
            if self.scale_d is not None:
                x = self.scale_d * x
            return x, info
        return self._solve_scaled_once_unscaled(b)

    def _solve_scaled_once_unscaled(self, b):
        dtype = np.asarray(self._operands[0]["ell_vals"]).dtype
        b_eff = (self.scale_d * b if self.scale_d is not None else b).astype(dtype)
        x, info = self._solve_scaled_once(b_eff)
        if self.scale_d is not None:
            x = self.scale_d * x
        return x, info

    def _solve_scaled_once(self, b_eff: np.ndarray):
        dtype = np.asarray(self._operands[0]["ell_vals"]).dtype
        b_eff = np.asarray(b_eff).astype(dtype)
        b_arrow = b_eff[self.arrow_perm]
        n_pad = self.row_of.shape[0]
        b_pad = np.zeros(n_pad, dtype=dtype)
        real = self.row_of >= 0
        b_pad[real] = b_arrow[self.row_of[real]]
        res = self._fn(jnp.asarray(b_pad), *self._operands)
        x_pad = np.asarray(res.x)
        x_arrow = np.zeros(self.n, dtype=np.float64)
        x_arrow[self.row_of[real]] = x_pad[real]
        x = np.empty(self.n)
        x[self.arrow_perm] = x_arrow
        info = {
            "iters": int(res.iters), "res": float(res.res),
            "normb": float(res.normb), "breakdown": bool(res.breakdown),
            "deflated": self.deflated,
        }
        return x, info
