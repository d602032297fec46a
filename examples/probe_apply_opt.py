#!/usr/bin/env python
"""Round-4 het-LORASC apply optimization probe (measurement only).

Questions, each timed with the in-dispatch chain method (scan-differential
analog, docs/PERFORMANCE.md):
  1. What do the panel<->flat layout conversions around the stencil SpMM
     cost vs ONE direct 2D transpose (node-major (nrb, bt) IS flat k-major
     transposed)?
  2. What does bf16 factor storage buy in _aii_solve (the factor stream is
     the byte floor: ~2.3 GB/solve at n=148k in f32)? The solve operator
     L~^-T L~^-1 stays exactly SPD for ANY stored factors, so only
     preconditioner QUALITY is at stake, not CG safety.
  3. Full lorasc_apply with both levers.
"""
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[probe {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main():
    os.environ.setdefault("PREALPS_STENCIL_IMPL", "pallas")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/prealps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import scipy.sparse as sp

    nel = int(os.environ.get("PREALPS_PROBE_NEL", "36"))
    nparts = int(os.environ.get("PREALPS_PROBE_NPARTS", "8"))
    defl = int(os.environ.get("PREALPS_PROBE_DEFL", "256"))
    t = int(os.environ.get("PREALPS_PROBE_T", "12"))
    K = int(os.environ.get("PREALPS_PROBE_K", "20"))

    cache = f"/tmp/prealps_ela_{nel}_1.npz"
    d = np.load(cache)
    a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                      shape=tuple(d["shape"]))
    from prealps_tpu.core.scaling import sym_rac_scaling
    from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
    from prealps_tpu.ops.spmm import (
        panel_from_flat_kmajor,
        panel_to_flat_kmajor,
        stencil_bsr_spmm_t,
        stencil_flat_chunk,
        stencil_flat_ext,
    )
    from prealps_tpu.precond import lorasc_scale as ls

    a_s, _ = sym_rac_scaling(a)
    a_t = csr_to_stencil_bsr_t(a_s, br=3, dtype=np.float32)
    t0 = time.time()
    pre = ls.build_scalable_lorasc(
        a_s, nparts=nparts, br=3, grid=(nel + 1, nel + 1, nel),
        max_deflation=defl, dtype=np.float32, a_stencil=a_t,
        correction="deflate")
    plan = pre.plan
    ops = pre.operands
    log(f"build {time.time()-t0:.0f}s bs_i={plan.bs_i} nblk_i={plan.nblk_i} "
        f"bs_g={plan.bs_g} nblk_g={plan.nblk_g} deflated={pre.deflated}")

    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal((t, 3, plan.nrb)).astype(np.float32))
    bt = 3 * t

    def timed(f, label, x0, opsd):
        @jax.jit
        def chain(v, op):
            def body(_, vv):
                y = f(vv, op)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, K, body, v)
        y = chain(x0, opsd)
        np.asarray(jnp.max(y))
        x1 = x0 * 1.0000001
        tt = time.perf_counter()
        y = chain(x1, opsd)
        np.asarray(jnp.max(y))
        ms = (time.perf_counter() - tt) / K * 1e3
        print(f"{label}: {ms:.3f} ms", flush=True)
        return ms

    # --- 1. conversion costs ---------------------------------------------
    rn0 = ls._to_node_major(r0)[:-1]  # (nrb, bt)

    def conv_chain(v, _):
        # node-major -> panel -> flat k-major (the current apply path)
        p = ls._from_node_major(plan, v)
        f = panel_to_flat_kmajor(p)
        return f.T  # back to node-major shape so the chain composes

    timed(conv_chain, "conv chained (node->panel->flat) + direct T back",
          rn0, ops)

    def conv_direct(v, _):
        f = v.T          # (bt, nrb)
        return f.T
    timed(conv_direct, "conv direct 2x transpose (nrb,bt)<->(bt,nrb)",
          rn0, ops)

    # --- SpMM variants ----------------------------------------------------
    timed(lambda v, o: stencil_bsr_spmm_t(a_t, v), "spmm panel api", r0, ops)

    s_max, br = a_t.blocks_t.shape[0], a_t.blocks_t.shape[1]
    halo = max(max(abs(o) for o in a_t.offsets), 0)
    chunk_f = stencil_flat_chunk(t, br, s_max)
    bf = a_t.blocks_t.reshape(s_max * br * br, plan.nrb)

    def spmm_flat_panel(v, _):
        # panel -> flat by the cheap (1,0,2) swap, kernel, back
        xf = panel_to_flat_kmajor(v)
        x_ext = jnp.concatenate(
            [xf[:, plan.nrb - halo:], xf, xf[:, :halo]], axis=1)
        yf = stencil_flat_ext(bf, a_t.offsets, x_ext, halo, br=br,
                              chunk=chunk_f)
        return panel_from_flat_kmajor(yf, br)
    timed(spmm_flat_panel, "spmm flat (panel in/out, explicit)", r0, ops)

    def spmm_node(v, _):
        # node-major in/out: ONE transpose each way
        xf = v.T
        x_ext = jnp.concatenate(
            [xf[:, plan.nrb - halo:], xf, xf[:, :halo]], axis=1)
        yf = stencil_flat_ext(bf, a_t.offsets, x_ext, halo, br=br,
                              chunk=chunk_f)
        return yf.T
    timed(spmm_node, "spmm node-major (direct T in/out)", rn0, ops)

    # --- aii_solve: f32 vs bf16 factors ----------------------------------
    vi0 = ls._gather_int(plan, ops, ls._to_node_major(r0))
    timed(lambda v, o: ls._aii_solve(plan, o, v), "aii_solve f32", vi0, ops)

    ops_bf = dict(ops)
    ops_bf["aii_linv"] = ops["aii_linv"].astype(jnp.bfloat16)
    ops_bf["aii_moff"] = ops["aii_moff"].astype(jnp.bfloat16)
    ops_bf["agg_linv"] = ops["agg_linv"].astype(jnp.bfloat16)
    ops_bf["agg_moff"] = ops["agg_moff"].astype(jnp.bfloat16)
    timed(lambda v, o: ls._aii_solve(plan, o, v), "aii_solve bf16 factors",
          vi0, ops_bf)

    g0 = ls._gather_sep(plan, ops, ls._to_node_major(r0))
    timed(lambda v, o: ls._agg_solve(plan, o, v), "agg_solve f32", g0, ops)
    timed(lambda v, o: ls._agg_solve(plan, o, v), "agg_solve bf16 factors",
          g0, ops_bf)

    # --- full apply variants ----------------------------------------------
    timed(lambda v, o: ls.lorasc_apply(plan, o, v), "apply baseline", r0, ops)
    timed(lambda v, o: ls.lorasc_apply(plan, o, v), "apply bf16 factors",
          r0, ops_bf)

    # apply with node-major SpMMs (both levers; local re-statement of
    # lorasc_apply's deflate branch with spmm_node)
    def apply_opt(r, o):
        rn = ls._to_node_major(r)
        vi = ls._gather_int(plan, o, rn)
        vg = ls._gather_sep(plan, o, rn)
        c1 = jnp.einsum("kbn,tbn->kt", o["w_lift"], r,
                        precision=jax.lax.Precision.HIGHEST)
        vg = vg - jnp.einsum("gk,kt->gt", o["aw_sep"],
                             ls._coarse_solve(o, c1),
                             precision=jax.lax.Precision.HIGHEST)
        zi = ls._aii_solve(plan, o, vi)
        y = spmm_node(ls._embed_int(plan, o, zi), o)
        y2n = jnp.concatenate([y, jnp.zeros_like(y[:1])], axis=0)
        agi_zi = ls._gather_sep(plan, o, y2n)
        g = (vg - agi_zi) * o["sep_mask"][:, None]
        zg = ls._agg_solve(plan, o, g)
        zg = zg * o["sep_mask"][:, None]
        y2 = spmm_node(ls._embed_sep(plan, o, zg), o)
        y2n2 = jnp.concatenate([y2, jnp.zeros_like(y2[:1])], axis=0)
        aig_zg = ls._gather_int(plan, o, y2n2)
        wi = zi - ls._aii_solve(plan, o, aig_zg)
        w = ls._embed_int(plan, o, wi) + ls._embed_sep(plan, o, zg)
        out = ls._from_node_major(plan, w)
        dd = jnp.einsum("gk,gt->kt", o["aw_sep"], zg,
                        precision=jax.lax.Precision.HIGHEST)
        out = out + jnp.einsum("kbn,kt->tbn", o["w_lift"],
                               ls._coarse_solve(o, c1 - dd),
                               precision=jax.lax.Precision.HIGHEST)
        return out

    timed(apply_opt, "apply node-spmm f32", r0, ops)
    timed(apply_opt, "apply node-spmm + bf16 factors", r0, ops_bf)

    # consistency: opt-apply output must match baseline to f32 roundoff
    yb = ls.lorasc_apply(plan, ops, r0)
    yo = apply_opt(r0, ops)
    err = float(jnp.max(jnp.abs(yb - yo)) / jnp.max(jnp.abs(yb)))
    print(f"node-spmm apply consistency vs baseline: rel {err:.2e}",
          flush=True)
    ybf = apply_opt(r0, ops_bf)
    errb = float(jnp.max(jnp.abs(yb - ybf)) / jnp.max(jnp.abs(yb)))
    print(f"bf16-factor apply deviation vs f32: rel {errb:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
