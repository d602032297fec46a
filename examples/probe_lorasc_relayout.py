#!/usr/bin/env python
"""Measure the het-LORASC apply after the flat-node-major / t-major-band
relayout (docs/PERFORMANCE.md): full-apply chain timing + component splits.
Run on the real TPU; PREALPS_PROBE_NPARTS sweeps the partition count."""
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
    from prealps_tpu.ops.spmm import stencil_bsr_spmm_t
    from prealps_tpu.precond.lorasc_scale import (
        _aii_solve,
        _embed_int,
        _embed_sep,
        _from_node_major,
        _gather_int,
        _gather_sep,
        _to_node_major,
        build_scalable_lorasc,
        lorasc_apply,
    )

    a_s, _ = sym_rac_scaling(a)
    a_t = csr_to_stencil_bsr_t(a_s, br=3, dtype=np.float32)
    t0 = time.time()
    pre = build_scalable_lorasc(
        a_s, nparts=nparts, br=3, grid=(nel + 1, nel + 1, nel),
        max_deflation=defl, dtype=np.float32, a_stencil=a_t)
    plan = pre.plan
    log(f"build {time.time()-t0:.0f}s nparts={nparts} bs_i={plan.bs_i} "
        f"nblk_i={plan.nblk_i} bs_g={plan.bs_g} deflated={pre.deflated}")

    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal((t, 3, plan.nrb)).astype(np.float32))

    def timed(f, label, x0, ops):
        @jax.jit
        def chain(v, op):
            def body(_, vv):
                y = f(vv, op)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, K, body, v)
        y = chain(x0, ops)
        np.asarray(jnp.max(y))
        x1 = x0 * 1.0000001
        tt = time.perf_counter()
        y = chain(x1, ops)
        np.asarray(jnp.max(y))
        print(f"{label}: {(time.perf_counter()-tt)/K*1e3:.2f} ms", flush=True)

    timed(lambda v, ops: lorasc_apply(plan, ops, v), "lorasc_apply full",
          r0, pre.operands)
    timed(lambda v, ops: stencil_bsr_spmm_t(a_t, v), "spmm alone",
          r0, pre.operands)
    vi0 = _gather_int(plan, pre.operands, _to_node_major(r0))
    timed(lambda v, ops: _aii_solve(plan, ops, v), "aii_solve alone",
          vi0, pre.operands)

    def gathers(v, ops):
        rn = _to_node_major(v)
        vi = _gather_int(plan, ops, rn)
        vg = _gather_sep(plan, ops, rn)
        w = _embed_int(plan, ops, vi) + _embed_sep(plan, ops, vg)
        return _from_node_major(plan, w)

    timed(gathers, "gather+embed roundtrip", r0, pre.operands)
    return 0


if __name__ == "__main__":
    sys.exit(main())
