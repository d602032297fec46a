"""SpMM kernels: A (sparse) × X (n × t dense panel).

This is THE hot kernel of enlarged-Krylov methods (reference:
utils/cplm_v0/cplm_v0_matmult_v2.c performs it with mkl_dcsrmm per block).
TPU-native design: the enlarging factor t is the MXU batch dimension; the
matrix lives in block-ELL so every unit of work is a dense (bm, bk) x (bk, t)
matmul with statically known shapes.

Three implementations:
* ell_spmm        — gather-based ELL, pure XLA. Fallback / CPU path.
* block_ell_spmm  — block-ELL via gather + einsum, pure XLA.
* block_ell_spmm_pallas — Pallas TPU kernel: grid over row-block chunks,
  scalar-prefetched block-column indices, X panel resident in VMEM,
  A blocks streamed HBM→VMEM by the pallas pipeline, MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prealps_tpu.ops.formats import BlockEllMatrix, DiaEllMatrix, EllMatrix


def ell_spmm(a: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x with A in ELL format. x: (ncols, t) -> y: (n, t)."""
    gathered = x[a.cols]            # (n, L, t)
    return jnp.einsum("nl,nlt->nt", a.vals, gathered,
                      precision=jax.lax.Precision.HIGHEST)


def dia_ell_spmm(a: DiaEllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for hybrid DIA+ELL. x: (n, t) -> y: (n, t).

    Each promoted diagonal is one broadcast FMA over a statically shifted
    row-window of x (major-axis slices — cheap); only the remainder gathers.
    """
    n = a.shape[0]
    lo = max(-min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    x_pad = jnp.concatenate(
        [jnp.zeros((lo,) + x.shape[1:], x.dtype), x,
         jnp.zeros((hi,) + x.shape[1:], x.dtype)], axis=0)
    y = jnp.zeros_like(x[:n])
    for d, off in enumerate(a.offsets):
        xs = jax.lax.slice_in_dim(x_pad, lo + off, lo + off + n, axis=0)
        y = y + a.diags[d][:, None] * xs
    if a.rem is not None:
        y = y + ell_spmm(a.rem, x)
    return y


def block_ell_spmm(a: BlockEllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x with A in block-ELL, pure XLA. x: (ncols_pad, t)."""
    nrb, s_max, bm, bk = a.blocks.shape
    t = x.shape[1]
    xb = x.reshape(-1, bk, t)       # (ncb, bk, t)
    gathered = xb[a.blkcols]        # (nrb, S, bk, t)
    y = jnp.einsum("rsmk,rskt->rmt", a.blocks, gathered,
                   preferred_element_type=x.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(nrb * bm, t)


def _spmm_kernel(blkcols_ref, x_ref, blocks_ref, out_ref, *, rb_per_prog, s_max, bk):
    """Pallas kernel body: one program handles rb_per_prog row blocks.

    blkcols_ref: scalar-prefetch, (nrb * s_max,) int32
    x_ref:       (ncols_pad, t) VMEM (whole panel resident)
    blocks_ref:  (rb_per_prog, s_max, bm, bk) VMEM (this program's chunk)
    out_ref:     (rb_per_prog * bm, t) VMEM
    """
    prog = pl.program_id(0)
    t = out_ref.shape[1]
    bm = blocks_ref.shape[2]

    for r in range(rb_per_prog):
        rb_global = prog * rb_per_prog + r
        acc = jnp.zeros((bm, t), dtype=jnp.float32)

        def body(s, acc):
            col = blkcols_ref[rb_global * s_max + s]
            xblk = x_ref[pl.ds(col * bk, bk), :]
            blk = blocks_ref[r, s, :, :]
            return acc + jnp.dot(blk, xblk, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

        acc = jax.lax.fori_loop(0, s_max, body, acc)
        out_ref[pl.ds(r * bm, bm), :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rb_per_prog", "interpret"))
def block_ell_spmm_pallas(
    a: BlockEllMatrix, x: jax.Array, rb_per_prog: int = 16, interpret: bool = False
) -> jax.Array:
    """Pallas TPU block-ELL SpMM. Requires x.shape[0] == a.shape[1] (padded).

    The X panel is kept whole in VMEM (n_pad * t * 4 bytes — fine for the
    problem sizes this library targets per chip); A value blocks are streamed
    through the pallas grid pipeline chunk by chunk, so HBM traffic ≈ the
    block-ELL payload, the speed-of-light bound for this format.
    """
    nrb, s_max, bm, bk = a.blocks.shape
    n_pad = nrb * bm
    t = x.shape[1]
    while nrb % rb_per_prog:
        rb_per_prog //= 2
    rb_per_prog = max(rb_per_prog, 1)
    grid = (nrb // rb_per_prog,)

    kernel = functools.partial(
        _spmm_kernel, rb_per_prog=rb_per_prog, s_max=s_max, bk=bk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a.shape[1], t), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rb_per_prog, s_max, bm, bk),
                lambda i, s: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb_per_prog * bm, t), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    flops = 2 * nrb * s_max * bm * bk * t
    bytes_accessed = a.blocks.size * a.blocks.dtype.itemsize + x.size * x.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, t), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(a.blkcols.reshape(-1), x, a.blocks)


def spmm(a, x: jax.Array) -> jax.Array:
    """Dispatch on format; dense jnp arrays fall through to a plain matmul.
    Stencil formats expect their native x layout ((n,t) resp. (t,br,nrb))."""
    from prealps_tpu.ops.formats import StencilBsrMatrix, StencilBsrTMatrix

    if isinstance(a, EllMatrix):
        return ell_spmm(a, x)
    if isinstance(a, DiaEllMatrix):
        return dia_ell_spmm(a, x)
    if isinstance(a, BlockEllMatrix):
        return block_ell_spmm(a, x)
    if isinstance(a, StencilBsrMatrix):
        return stencil_bsr_spmm(a, x)
    if isinstance(a, StencilBsrTMatrix):
        return stencil_bsr_spmm_t(a, x)
    return a @ x


def stencil_bsr_spmm(a, x: jax.Array) -> jax.Array:
    """y = A @ x for StencilBsrMatrix. x: (n, t) -> y: (n, t).

    One shifted read of x per stencil offset; boundary wrap-around from roll
    multiplies zero blocks, so the result is exact. Reads each operand ~once
    from HBM — the speed-of-light formulation for structured-grid operators.
    """
    nrb, s_max, br, _ = a.blocks.shape
    t = x.shape[1]
    x3 = x.reshape(nrb, br, t)
    y = jnp.zeros((nrb, br, t), dtype=x.dtype)
    for s, off in enumerate(a.offsets):
        xs = jnp.roll(x3, -off, axis=0) if off else x3
        y = y + jnp.einsum(
            "rmk,rkt->rmt", a.blocks[:, s], xs,
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    return y.reshape(nrb * br, t)


def stencil_scan_accumulate(blocks_t, offsets, x_ext, halo: int):
    """Core lane-major stencil accumulation.

    blocks_t: (S, br, br, nrb_loc); offsets: STATIC tuple of S ints;
    x_ext: (t, br, nrb_loc + 2*halo) extended panel (halo already attached).

    The shifted views are taken with STATIC slices (dynamic lane-dim slicing
    is slow in XLA and unsupported in this Mosaic build), stacked, and the
    contraction runs as a lax.scan over the offset axis (small traced graph).
    Set PREALPS_STENCIL_IMPL=unrolled to trade compile time for the fully
    unrolled variant (no scan overhead).
    """
    import os

    s_max, br, _, nrb = blocks_t.shape
    t = x_ext.shape[0]
    impl = os.environ.get("PREALPS_STENCIL_IMPL", "shift_scan")

    if impl == "unrolled":
        y = [jnp.zeros((t, nrb), dtype=x_ext.dtype) for _ in range(br)]
        for s, off in enumerate(offsets):
            xs = jax.lax.slice_in_dim(x_ext, halo + off, halo + off + nrb, axis=2)
            for m in range(br):
                acc = y[m]
                for k in range(br):
                    acc = acc + blocks_t[s, m, k][None, :] * xs[:, k, :]
                y[m] = acc
        return jnp.stack(y, axis=1)

    if impl == "broadcast":
        # per-offset fused broadcast-multiply + k-reduction: one pass over x
        # and y per offset instead of br² separate FMA kernels
        y = jnp.zeros((t, br, nrb), dtype=x_ext.dtype)
        for s, off in enumerate(offsets):
            xs = jax.lax.slice_in_dim(x_ext, halo + off, halo + off + nrb, axis=2)
            y = y + jnp.sum(
                blocks_t[s][None, :, :, :] * xs[:, None, :, :], axis=2
            )
        return y

    xsh = jnp.stack([
        jax.lax.slice_in_dim(x_ext, halo + off, halo + off + nrb, axis=2)
        for off in offsets
    ])  # (S, t, br, nrb)

    def step(y, inp):
        blk, xs = inp  # (br, br, nrb), (t, br, nrb)
        new = []
        for m in range(br):
            acc = y[m]
            for k in range(br):
                acc = acc + blk[m, k][None, :] * xs[:, k, :]
            new.append(acc)
        return tuple(new), None

    y0 = tuple(jnp.zeros((t, nrb), dtype=x_ext.dtype) for _ in range(br))
    y, _ = jax.lax.scan(step, y0, (blocks_t, xsh))
    return jnp.stack(y, axis=1)


def stencil_scan_accumulate_df(blocks_t, offsets, x_ext, halo: int):
    """Lane-major stencil SpMM in double-float: returns (y_hi, y_lo).

    Same contraction as stencil_scan_accumulate, but every product is an
    error-free two_prod and every accumulation a compensated two_sum, so the
    pair (y_hi, y_lo) carries ~49 effective mantissa bits. Used for the
    on-device iterative-refinement residual (parallel/driver.py), where a
    plain f32 SpMM's O(eps·Σ|a||x|) rounding floor (~1e-5 relative) would
    cap the attainable tolerance. ~10× the flops of the f32 kernel, run
    once per refinement round — negligible next to the inner solve.
    """
    from prealps_tpu.ops.doublefloat import two_prod, two_sum

    s_max, br, _, nrb = blocks_t.shape
    t = x_ext.shape[0]
    xsh = jnp.stack([
        jax.lax.slice_in_dim(x_ext, halo + off, halo + off + nrb, axis=2)
        for off in offsets
    ])  # (S, t, br, nrb)

    def step(carry, inp):
        hi, lo = carry
        blk, xs = inp  # (br, br, nrb), (t, br, nrb)
        new_h, new_l = [], []
        for m in range(br):
            h, l = hi[m], lo[m]
            for k in range(br):
                p, e = two_prod(blk[m, k][None, :], xs[:, k, :])
                h, e1 = two_sum(h, p)
                l = l + (e1 + e)
            new_h.append(h)
            new_l.append(l)
        return (tuple(new_h), tuple(new_l)), None

    z = tuple(jnp.zeros((t, nrb), x_ext.dtype) for _ in range(br))
    (hi, lo), _ = jax.lax.scan(step, (z, z), (blocks_t, xsh))
    return jnp.stack(hi, axis=1), jnp.stack(lo, axis=1)


def ell_gather_spmm_df(vals: jax.Array, gathered: jax.Array):
    """einsum('ml,mlt->mt') in double-float: returns (y_hi, y_lo).

    vals: (m, L) ELL values; gathered: (m, L, t) pre-gathered x rows.
    Compensated L-axis reduction via lax.scan (see
    stencil_scan_accumulate_df for why).
    """
    from prealps_tpu.ops.doublefloat import two_prod, two_sum

    p, e = two_prod(vals[:, :, None], gathered)  # (m, L, t)

    def step(carry, inp):
        h, l = carry
        pj, ej = inp
        h, e1 = two_sum(h, pj)
        return (h, l + (e1 + ej)), None

    z = jnp.zeros((p.shape[0], p.shape[2]), p.dtype)
    (hi, lo), _ = jax.lax.scan(
        step, (z, z), (jnp.moveaxis(p, 1, 0), jnp.moveaxis(e, 1, 0)))
    return hi, lo


def stencil_bsr_spmm_t(a, xt: jax.Array) -> jax.Array:
    """Lane-major stencil SpMM: xt (t, br, nrb) -> yt (t, br, nrb).

    All arrays keep the long node axis minor (TPU lanes); the br×br block
    product is br² broadcast FMAs per stencil offset — pure VPU work at full
    lane utilisation, reading each operand once. Wrap-around entries multiply
    zero blocks, so attaching the panel's own boundary slices as halos is
    exact (same argument as jnp.roll).

    PREALPS_STENCIL_IMPL=pallas routes to the BlockSpec Pallas kernel on the
    TPU backend (measured 0.90 ms vs 1.53 ms XLA-unrolled at n=148k/t=12,
    bit-exact — docs/PERFORMANCE.md); other backends and impls use the XLA
    shift formulations.
    """
    import os

    s_max, br, _, nrb = a.blocks_t.shape
    halo = max(max(abs(o) for o in a.offsets), 0)
    if (
        os.environ.get("PREALPS_STENCIL_IMPL", "pallas") == "pallas"
        and jax.default_backend() == "tpu"
    ):
        # pallas is the DEFAULT on TPU (round-4 measurement: the scan impl
        # inside the LORASC apply ran at 1.76 ms vs the flat kernel's
        # 0.17 ms — only bench.py used to set the env, so CLI/library
        # callers silently paid 10× per operator apply)
        # Wide panels (the Lanczos S·V refinement applies the operator at
        # t≈nev) would need a chunk below the halo — those fall back to the
        # XLA path. The flat sublane-dense kernel is the fast path (0.16 ms
        # vs 0.30 tiled at n=148k/t=12); layout conversions here cost two
        # small relayouts — callers on the hot path (parallel/driver.py)
        # pre-flatten instead.
        t_dim = xt.shape[0]
        chunk_f = stencil_flat_chunk(t_dim, br, s_max)
        if chunk_f >= halo:
            bf = a.blocks_t.reshape(s_max * br * br, nrb)
            xf = panel_to_flat_kmajor(xt)
            x_ext = jnp.concatenate(
                [xf[:, nrb - halo:], xf, xf[:, :halo]], axis=1)
            yf = stencil_flat_ext(bf, a.offsets, x_ext, halo, br=br,
                                  chunk=chunk_f)
            return panel_from_flat_kmajor(yf, br)
        chunk = stencil_pallas_chunk(t_dim, br, s_max)
        if chunk >= halo:
            return stencil_bsr_spmm_t_pallas_bs(a, xt, chunk=chunk)
    x_ext = jnp.concatenate(
        [xt[:, :, nrb - halo:], xt, xt[:, :, :halo]], axis=2
    )
    return stencil_scan_accumulate(a.blocks_t, a.offsets, x_ext, halo)


def panel_to_lane_major(x: jax.Array, br: int) -> jax.Array:
    """(n, t) -> (t, br, nrb)"""
    n, t = x.shape
    return x.reshape(n // br, br, t).transpose(2, 1, 0)


def panel_from_lane_major(xt: jax.Array) -> jax.Array:
    """(t, br, nrb) -> (n, t)"""
    t, br, nrb = xt.shape
    return xt.transpose(2, 1, 0).reshape(nrb * br, t)


def _stencil_t_kernel(off_ref, xext_hbm, blocks_ref, out_ref, xbuf, sems,
                      *, s_max, br, halo, chunk, t_dim):
    """Pallas kernel: lane-major stencil SpMM over one node chunk.

    Each stencil offset's shifted window of x is fetched by its own DMA
    (double-buffered) — arbitrary element offsets are fine for DMAs, while
    dynamic lane slicing in-register is not supported by Mosaic.

    off_ref:    (s_max,) scalar-prefetch stencil offsets
    xext_hbm:   (t, br, nrb_pad + 2*halo) in ANY/HBM
    blocks_ref: (s_max, br, br, chunk) VMEM (pipelined per grid step)
    out_ref:    (t, br, chunk) VMEM
    xbuf:       (2, t, br, chunk) VMEM double buffer
    """
    i = pl.program_id(0)

    def start_dma(s, slot):
        start = i * chunk + halo + off_ref[s]
        return pltpu.make_async_copy(
            xext_hbm.at[:, :, pl.ds(start, chunk)], xbuf.at[slot], sems.at[slot]
        )

    start_dma(0, 0).start()

    def body(s, carry):
        slot = jax.lax.rem(s, 2)

        @pl.when(s + 1 < s_max)
        def _():
            start_dma(s + 1, jax.lax.rem(s + 1, 2)).start()

        start_dma(s, slot).wait()
        new = []
        for m in range(br):
            acc = carry[m]
            for k in range(br):
                acc = acc + blocks_ref[s, m, k][None, :] * xbuf[slot, :, k, :]
            new.append(acc)
        return tuple(new)

    y0 = tuple(jnp.zeros((t_dim, chunk), jnp.float32) for _ in range(br))
    y = jax.lax.fori_loop(0, s_max, body, y0)
    for m in range(br):
        out_ref[:, m, :] = y[m].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def stencil_bsr_spmm_t_pallas(a, xt: jax.Array, chunk: int = 4096,
                              interpret: bool = False) -> jax.Array:
    """Pallas lane-major stencil SpMM: xt (t, br, nrb) -> (t, br, nrb).

    Speed-of-light formulation: the x chunk (plus halo) is DMA'd to VMEM once
    and re-read from VMEM for every stencil offset, so HBM traffic is
    blocks (fill≈1) + x + y — the minimum possible. Wrap-around halo entries
    multiply zero blocks (same exactness argument as the roll/scan paths).
    """
    s_max, br, _, nrb = a.blocks_t.shape
    t_dim = xt.shape[0]
    halo = max(max(abs(o) for o in a.offsets), 0)
    grid = -(-nrb // chunk)
    nrb_pad = grid * chunk

    # x with wrap halos attached, padded to the grid
    x_ext = jnp.concatenate(
        [xt[:, :, nrb - halo:], xt, xt[:, :, :halo],
         jnp.zeros((t_dim, br, nrb_pad - nrb), xt.dtype)],
        axis=2,
    )
    blocks = a.blocks_t
    if nrb_pad != nrb:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((s_max, br, br, nrb_pad - nrb), blocks.dtype)],
            axis=3,
        )
    offs = jnp.asarray(a.offsets, dtype=jnp.int32)

    kernel = functools.partial(
        _stencil_t_kernel, s_max=s_max, br=br, halo=halo, chunk=chunk,
        t_dim=t_dim,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x_ext stays in HBM
            pl.BlockSpec(
                (s_max, br, br, chunk), lambda i, s: (0, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_dim, br, chunk), lambda i, s: (0, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, t_dim, br, chunk), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_dim, br, nrb_pad), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_max * br * br * nrb * t_dim,
            bytes_accessed=blocks.size * 4 + 2 * xt.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(offs, x_ext, blocks)
    return out[:, :, :nrb]


def _stencil_bs_kernel(xm_ref, x0_ref, xp_ref, blocks_ref, out_ref,
                       *, offsets, halo, chunk, br, t_dim):
    """BlockSpec-only lane-major stencil kernel (no manual DMA — the Mosaic
    build behind this environment's remote compiler rejects make_async_copy).

    Three shifted views of the padded x cover every offset's window with
    NON-overlapping BlockSpec tiles: output chunk i needs x rows
    [i*C, i*C + C + 2h) ⊆ blocks {i, i+1, i+2} of the (grid+2)-padded x.
    The whole 243-term FMA chain accumulates in VMEM — one pass over x and
    blocks instead of XLA's materialised per-offset intermediates (the 25×
    memory-traffic gap measured in docs/PERFORMANCE.md).
    """
    xw = jnp.concatenate([xm_ref[...], x0_ref[...], xp_ref[...]], axis=2)
    acc = [jnp.zeros((t_dim, chunk), jnp.float32) for _ in range(br)]
    for s, off in enumerate(offsets):
        # output row j of chunk i sits at window position C + j (the x views
        # lead by C − halo), so offset o reads [C + o, C + o + C)
        lo = chunk + off
        xs = jax.lax.slice_in_dim(xw, lo, lo + chunk, axis=2)  # (t, br, C)
        for m in range(br):
            a = acc[m]
            for k in range(br):
                a = a + blocks_ref[s, m, k, :][None, :] * xs[:, k, :]
            acc[m] = a
    for m in range(br):
        out_ref[:, m, :] = acc[m].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def stencil_bsr_spmm_t_pallas_bs(a, xt: jax.Array, chunk: int = 2048,
                                 interpret: bool = False) -> jax.Array:
    """Lane-major stencil SpMM via a pure-BlockSpec Pallas pipeline.

    xt: (t, br, nrb) -> (t, br, nrb). Requires chunk ≥ halo. HBM traffic =
    blocks + 3×x + y (the 3× from the shifted views) — within ~2× of the
    roofline, vs ~30× for the unfused XLA chain.
    """
    s_max, br, _, nrb = a.blocks_t.shape
    t_dim = xt.shape[0]
    halo = max(max(abs(o) for o in a.offsets), 0)
    if chunk < halo:
        chunk = -(-halo // 128) * 128
    grid = -(-nrb // chunk)
    nrb_pad = grid * chunk

    # x with wrap halos, laid out so view block i+1 starts at x_ext row i*C:
    # x_pad[C - h + (r + h)] = x_ext[r + h] ⇒ place x_ext at offset C - halo
    x_ext = jnp.concatenate(
        [xt[:, :, nrb - halo:], xt, xt[:, :, :halo]], axis=2
    )  # (t, br, nrb + 2h)
    lead = chunk - halo
    tail = (grid + 2) * chunk - (lead + nrb + 2 * halo)
    x_pad = jnp.concatenate(
        [jnp.zeros((t_dim, br, lead), xt.dtype), x_ext,
         jnp.zeros((t_dim, br, tail), xt.dtype)], axis=2,
    )
    blocks = a.blocks_t
    if nrb_pad != nrb:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((s_max, br, br, nrb_pad - nrb), blocks.dtype)],
            axis=3,
        )

    kernel = functools.partial(
        _stencil_bs_kernel, offsets=a.offsets, halo=halo, chunk=chunk,
        br=br, t_dim=t_dim,
    )
    xspec = lambda k: pl.BlockSpec(
        (t_dim, br, chunk), lambda i, _k=k: (0, 0, i + _k)
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            xspec(0), xspec(1), xspec(2),
            pl.BlockSpec((s_max, br, br, chunk), lambda i: (0, 0, 0, i)),
        ],
        out_specs=pl.BlockSpec((t_dim, br, chunk), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((t_dim, br, nrb_pad), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_max * br * br * nrb * t_dim,
            bytes_accessed=blocks.size * 4 + 4 * xt.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, x_pad, x_pad, blocks)
    return out[:, :, :nrb]


# ---------------------------------------------------------------------------
# Planar stencil SpMM: flat (t, br·nrb) panels, sublane-efficient layouts
# ---------------------------------------------------------------------------
#
# TPU tiles the minor two dims of every array to (8, 128); a lane-major
# (t, br, nrb) panel with br=3 therefore wastes 5/8 of every sublane, and
# the (S, br, br, nrb) block table wastes the same on the dominant read.
# The planar formulation keeps panels FLAT 2-D — row = [plane k=0 | plane
# k=1 | ... ] of length br·nrb — and the block table as (br, S·br, nrb),
# so both tile densely. This is the kernel behind the stacked ECG state
# (solvers/ecg.py::_iter_odir_fused_stacked), which stores all panels flat.


def stencil_blocks_planar(blocks_t: jax.Array) -> jax.Array:
    """(S, br, br, nrb) -> (br, S·br, nrb): output-plane-major block table.

    One-time device reshuffle at build; rows within plane m are ordered
    [s][k] to match _stencil_planar_kernel's indexing."""
    s, br, _, nrb = blocks_t.shape
    return jnp.transpose(blocks_t, (1, 0, 2, 3)).reshape(br, s * br, nrb)


def _stencil_planar_kernel(*args, offsets, chunk, br, t_dim):
    """One (output plane m, node chunk i) tile of the planar stencil SpMM.

    args: 3·br shifted x views (k-major, shifts −1/0/+1 chunks), the
    (1, S·br, chunk) block tile for plane m, the (t, chunk) output."""
    xv = args[: 3 * br]
    blocks_ref = args[3 * br]
    out_ref = args[3 * br + 1]
    xw = [
        jnp.concatenate(
            [xv[3 * k][...], xv[3 * k + 1][...], xv[3 * k + 2][...]], axis=1
        )
        for k in range(br)
    ]
    acc = jnp.zeros((t_dim, chunk), jnp.float32)
    for s, off in enumerate(offsets):
        lo = chunk + off
        for k in range(br):
            xs = jax.lax.slice_in_dim(xw[k], lo, lo + chunk, axis=1)
            acc = acc + blocks_ref[0, s * br + k, :][None, :] * xs
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "br", "nrb", "chunk", "interpret")
)
def stencil_spmm_planar(blocks3: jax.Array, x2: jax.Array, *, offsets,
                        br: int, nrb: int, chunk: int = 1536,
                        interpret: bool = False) -> jax.Array:
    """Planar stencil SpMM: x2 (t, br·nrb) -> (t, br·nrb).

    blocks3: (br, S·br, nrb) from stencil_blocks_planar. Requires
    chunk | nrb (the planar driver aligns the row layout) and chunk ≥ halo.
    Grid is (node chunk, output plane) with the plane innermost, so the nine
    shifted x views are fetched once per chunk and revisited across planes.
    Wrap-around halo entries multiply zero blocks (same exactness argument
    as the lane-major kernels)."""
    t_dim = x2.shape[0]
    halo = max(max(abs(o) for o in offsets), 0)
    if nrb % chunk or chunk < halo:
        raise ValueError(f"chunk {chunk} must divide nrb {nrb} and be >= halo {halo}")
    grid_n = nrb // chunk
    sect = (grid_n + 2) * chunk
    lead = chunk - halo
    tail = sect - (lead + nrb + 2 * halo)
    zl = jnp.zeros((t_dim, lead), x2.dtype)
    zt = jnp.zeros((t_dim, tail), x2.dtype)
    segs = []
    for k in range(br):
        pk = jax.lax.slice_in_dim(x2, k * nrb, (k + 1) * nrb, axis=1)
        segs += [zl, pk[:, nrb - halo:], pk, pk[:, :halo], zt]
    x_pad = jnp.concatenate(segs, axis=1)      # (t, br·sect)

    kernel = functools.partial(
        _stencil_planar_kernel, offsets=offsets, chunk=chunk, br=br,
        t_dim=t_dim,
    )
    sbr = blocks3.shape[1]
    xspec = lambda k, d: pl.BlockSpec(
        (t_dim, chunk),
        lambda i, m, _k=k, _d=d: (0, _k * (grid_n + 2) + i + _d),
    )
    in_specs = [xspec(k, d) for k in range(br) for d in range(3)]
    in_specs.append(
        pl.BlockSpec((1, sbr, chunk), lambda i, m: (m, 0, i))
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid_n, br),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_dim, chunk), lambda i, m: (0, m * grid_n + i)),
        out_shape=jax.ShapeDtypeStruct((t_dim, br * nrb), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * len(offsets) * br * br * nrb * t_dim,
            bytes_accessed=blocks3.size * 4 + 4 * x2.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*([x_pad] * (3 * br) + [blocks3]))
    return out


def stencil_spmm_planar_ref(blocks3: jax.Array, x2: jax.Array, *, offsets,
                            br: int, nrb: int) -> jax.Array:
    """XLA reference/fallback for stencil_spmm_planar (CPU tests, wide
    panels): reshape to lane-major, reuse the scan path, flatten back."""
    t_dim = x2.shape[0]
    s = len(offsets)
    blocks_t = jnp.transpose(
        blocks3.reshape(br, s, br, nrb), (1, 0, 2, 3)
    )
    xt = x2.reshape(t_dim, br, nrb)
    halo = max(max(abs(o) for o in offsets), 0)
    x_ext = jnp.concatenate(
        [xt[:, :, nrb - halo:], xt, xt[:, :, :halo]], axis=2
    )
    y = stencil_scan_accumulate(blocks_t, offsets, x_ext, halo)
    return y.reshape(t_dim, br * nrb)


@functools.partial(jax.jit, static_argnames=("offsets", "halo", "chunk",
                                             "interpret"))
def stencil_pallas_bs_ext(blocks_t: jax.Array, offsets, x_ext: jax.Array,
                          halo: int, chunk: int = 1536,
                          interpret: bool = False) -> jax.Array:
    """BlockSpec Pallas stencil SpMM taking a PRE-EXTENDED panel.

    x_ext: (t, br, nrb + 2·halo) with halos already attached (ring-ppermute
    halo exchange in the distributed driver, or wrap slices single-shard).
    Same kernel as stencil_bsr_spmm_t_pallas_bs; this entry point lets the
    solve's halo exchange (parallel/driver.py) feed the Pallas pipeline
    directly instead of the XLA scan path."""
    s_max, br, _, nrb = blocks_t.shape
    t_dim = x_ext.shape[0]
    if chunk < halo:
        chunk = -(-halo // 128) * 128
    grid = -(-nrb // chunk)
    nrb_pad = grid * chunk
    lead = chunk - halo
    tail = (grid + 2) * chunk - (lead + nrb + 2 * halo)
    x_pad = jnp.concatenate(
        [jnp.zeros((t_dim, br, lead), x_ext.dtype), x_ext,
         jnp.zeros((t_dim, br, tail), x_ext.dtype)], axis=2,
    )
    blocks = blocks_t
    if nrb_pad != nrb:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((s_max, br, br, nrb_pad - nrb), blocks.dtype)],
            axis=3,
        )
    kernel = functools.partial(
        _stencil_bs_kernel, offsets=offsets, halo=halo, chunk=chunk,
        br=br, t_dim=t_dim,
    )
    xspec = lambda k: pl.BlockSpec(
        (t_dim, br, chunk), lambda i, _k=k: (0, 0, i + _k)
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            xspec(0), xspec(1), xspec(2),
            pl.BlockSpec((s_max, br, br, chunk), lambda i: (0, 0, 0, i)),
        ],
        out_specs=pl.BlockSpec((t_dim, br, chunk), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((t_dim, br, nrb_pad), x_ext.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_max * br * br * nrb * t_dim,
            bytes_accessed=blocks.size * 4 + 4 * x_ext.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, x_pad, x_pad, blocks)
    return out[:, :, :nrb]


def stencil_pallas_chunk(t_dim: int, br: int, s_max: int) -> int:
    """VMEM-budget chunk for the BlockSpec stencil kernels (3 x views + out,
    t·br·chunk each, + the (s·br²·chunk) block tile, double-buffered)."""
    denom = (4 * t_dim * br + s_max * br * br) * 4 * 2
    return max((5_000_000 // denom) // 128 * 128, 128)


# ---------------------------------------------------------------------------
# Sublane-dense FLAT stencil kernel — the fastest measured formulation
# ---------------------------------------------------------------------------
#
# TPU tiles the minor two dims of every array to (8, 128). The lane-major
# block table (S, br, br, nrb) therefore physically streams 8/br of its
# logical bytes (br=3 → 2.67×: 128 MB instead of 48 at n=148k), and each
# (t, br, chunk) x view pads br→8 the same way. Flattening both kills the
# padding: blocks as (S·br², nrb) rows (row = s·br² + m·br + k) and x as
# (br·t, nodes) k-major rows tile densely. Differential-scan measurement on
# the v5e (docs/PERFORMANCE.md round 3): 0.16 ms vs 0.30 ms for the
# (t, br, chunk) BlockSpec kernel at n=148k/t=12 — within ~1.3× of the
# 62 MB/measured-stream-rate roofline. This is the per-chip mkl_dcsrmm
# role (reference: utils/cplm_light/cplm_kernels.c:620-671).


def _stencil_flat_kernel(xm_ref, x0_ref, xp_ref, blocks_ref, out_ref,
                         *, offsets, chunk, br, t_dim):
    """One node chunk: blocks flat (S·br² rows, chunk), x views flat
    k-major (br·t rows, chunk), out flat m-major (br·t rows, chunk)."""
    xw = jnp.concatenate([xm_ref[...], x0_ref[...], xp_ref[...]], axis=1)
    acc = [jnp.zeros((t_dim, chunk), jnp.float32) for _ in range(br)]
    for s, off in enumerate(offsets):
        lo = chunk + off
        xs = jax.lax.slice_in_dim(xw, lo, lo + chunk, axis=1)  # (br·t, C)
        for m in range(br):
            a = acc[m]
            for k in range(br):
                xk = jax.lax.slice_in_dim(
                    xs, k * t_dim, (k + 1) * t_dim, axis=0)
                # blocks may be STORED bf16 (a_store knob — measured slower,
                # docs/PERFORMANCE.md round 5, but kept functional): widen
                # ONLY bf16 so f64 interpret-mode exactness is preserved
                brow = blocks_ref[s * br * br + m * br + k, :]
                if brow.dtype == jnp.bfloat16:
                    brow = brow.astype(jnp.float32)
                a = a + brow[None, :] * xk
            acc[m] = a
    for m in range(br):
        out_ref[m * t_dim:(m + 1) * t_dim, :] = acc[m].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "halo", "br",
                                             "chunk", "interpret"))
def stencil_flat_ext(blocks_flat: jax.Array, offsets, x_ext: jax.Array,
                     halo: int, br: int, chunk: int = 1536,
                     interpret: bool = False) -> jax.Array:
    """Flat stencil SpMM taking a PRE-EXTENDED k-major panel.

    blocks_flat: (S·br², nrb) — row s·br² + m·br + k holds block entry
    (m, k) of stencil offset s over all nodes (see stencil_blocks_flat).
    x_ext: (br·t, nrb + 2·halo) k-major rows (row k·t + j = component k of
    search direction j) with halos already attached. -> (br·t, nrb)."""
    sbb, nrb = blocks_flat.shape
    bt_rows = x_ext.shape[0]
    t_dim = bt_rows // br
    if chunk < halo:
        chunk = -(-halo // 128) * 128
    grid = -(-nrb // chunk)
    nrb_pad = grid * chunk
    lead = chunk - halo
    tail = (grid + 2) * chunk - (lead + nrb + 2 * halo)
    x_pad = jnp.concatenate(
        [jnp.zeros((bt_rows, lead), x_ext.dtype), x_ext,
         jnp.zeros((bt_rows, tail), x_ext.dtype)], axis=1,
    )
    blocks = blocks_flat
    if nrb_pad != nrb:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((sbb, nrb_pad - nrb), blocks.dtype)], axis=1)
    kernel = functools.partial(
        _stencil_flat_kernel, offsets=offsets, chunk=chunk, br=br,
        t_dim=t_dim,
    )
    xspec = lambda k: pl.BlockSpec(
        (bt_rows, chunk), lambda i, _k=k: (0, i + _k))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[xspec(0), xspec(1), xspec(2),
                  pl.BlockSpec((sbb, chunk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((bt_rows, chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((bt_rows, nrb_pad), x_ext.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * sbb * nrb * t_dim,
            bytes_accessed=(blocks.size + 4 * x_ext.size) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, x_pad, x_pad, blocks)
    return out[:, :nrb]


def stencil_blocks_flat(blocks_t: jax.Array) -> jax.Array:
    """(S, br, br, nrb) -> (S·br², nrb) sublane-dense block table."""
    s, br, _, nrb = blocks_t.shape
    return blocks_t.reshape(s * br * br, nrb)


def panel_to_flat_kmajor(xt: jax.Array) -> jax.Array:
    """(t, br, nrb) lane-major -> (br·t, nrb) k-major flat rows."""
    t_dim, br, nrb = xt.shape
    return xt.transpose(1, 0, 2).reshape(br * t_dim, nrb)


def panel_from_flat_kmajor(yf: jax.Array, br: int) -> jax.Array:
    """(br·t, nrb) k-major flat -> (t, br, nrb) lane-major."""
    bt_rows, nrb = yf.shape
    return yf.reshape(br, bt_rows // br, nrb).transpose(1, 0, 2)


def stencil_flat_chunk(t_dim: int, br: int, s_max: int) -> int:
    """VMEM-budget chunk for the flat kernel: 3 x views + xw concat + out
    ((br·t)·chunk each) + the (S·br²·chunk) block tile, double-buffered.

    Swept on the real chip (examples/sweep_flat_chunk.py, n=148k/t=12/
    br=3/S=27): 1536 is the optimum (0.172 ms vs 0.181 at the old budget's
    1408 and 0.184 at 2048; ≥4096 overflows the Mosaic compile). Prefer it
    only while total VMEM usage stays within the sweep point's measured-safe
    footprint (1536·denom(t=12,br=3,S=27) ≈ 6.1 MB); everything else keeps
    the conservative 6 MB budget — larger t/S shapes have NOT been swept and
    a 17 % larger chunk there risks the Mosaic VMEM-overflow failure mode."""
    denom = (7 * t_dim * br + s_max * br * br) * 4 * 2
    if 1536 * denom <= 6_100_000:
        return 1536
    return max((6_000_000 // denom) // 128 * 128, 128)
