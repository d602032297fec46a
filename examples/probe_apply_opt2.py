#!/usr/bin/env python
"""Differential (two chain lengths) re-measurement of the apply variants.

probe_apply_opt.py timed single-length chains: cost = K·per_iter + C with C
the per-dispatch constant (remote-attach dispatch + fetch). This probe runs
each chain at two lengths and differences — the same method as bench.py's
kernel record — separating true per-iteration cost from C.
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
    os.environ["PREALPS_FACTOR_STORE"] = "f32"
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

    cache = f"/tmp/prealps_ela_{nel}_1.npz"
    d = np.load(cache)
    a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                      shape=tuple(d["shape"]))
    from prealps_tpu.core.scaling import sym_rac_scaling
    from prealps_tpu.ops.formats import csr_to_stencil_bsr_t
    from prealps_tpu.ops.spmm import stencil_bsr_spmm_t
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
    log(f"build {time.time()-t0:.0f}s deflated={pre.deflated}")

    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal((t, 3, plan.nrb)).astype(np.float32))

    import functools

    def timed(f, label, x0, opsd, k_short=20, k_long=100):
        @functools.partial(jax.jit, static_argnums=2)
        def chain(v, op, k):
            def body(_, vv):
                y = f(vv, op)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, k, body, v)

        def run(k, x):
            y = chain(x, opsd, k)
            np.asarray(jnp.max(y))      # compile + warm
            best = 1e9
            for _ in range(2):
                x = x * 1.0000001
                tt = time.perf_counter()
                y = chain(x, opsd, k)
                np.asarray(jnp.max(y))
                best = min(best, time.perf_counter() - tt)
            return best

        ts = run(k_short, x0)
        tl = run(k_long, x0)
        ms = (tl - ts) / (k_long - k_short) * 1e3
        c = ts - k_short * (tl - ts) / (k_long - k_short)
        print(f"{label}: {ms:.3f} ms/iter (dispatch const {c*1e3:.1f} ms)",
              flush=True)
        return ms

    timed(lambda v, o: v.T.T * 1.0, "noop transpose pair", r0, ops)
    timed(lambda v, o: stencil_bsr_spmm_t(a_t, v), "spmm panel api", r0, ops)

    vi0 = ls._gather_int(plan, ops, ls._to_node_major(r0))
    timed(lambda v, o: ls._aii_solve(plan, o, v), "aii_solve f32", vi0, ops)
    ops_bf = dict(ops)
    for k in ("aii_linv", "aii_moff", "agg_linv", "agg_moff"):
        ops_bf[k] = ops_bf[k].astype(jnp.bfloat16)
    timed(lambda v, o: ls._aii_solve(plan, o, v), "aii_solve bf16", vi0,
          ops_bf)
    g0 = ls._gather_sep(plan, ops, ls._to_node_major(r0))
    timed(lambda v, o: ls._agg_solve(plan, o, v), "agg_solve f32", g0, ops)
    timed(lambda v, o: ls._agg_solve(plan, o, v), "agg_solve bf16", g0,
          ops_bf)

    def gathers(v, o):
        rn = ls._to_node_major(v)
        vi = ls._gather_int(plan, o, rn)
        vg = ls._gather_sep(plan, o, rn)
        w = ls._embed_int(plan, o, vi) + ls._embed_sep(plan, o, vg)
        return ls._from_node_major(plan, w)
    timed(gathers, "gather+embed roundtrip", r0, ops)

    timed(lambda v, o: ls.lorasc_apply(plan, o, v), "apply f32", r0, ops)
    timed(lambda v, o: ls.lorasc_apply(plan, o, v), "apply bf16", r0, ops_bf)
    return 0


if __name__ == "__main__":
    sys.exit(main())
