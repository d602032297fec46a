"""On-device block-Jacobi construction from the stencil operator.

The dense diagonal blocks a block-Jacobi preconditioner needs are
submatrices of A — and A is already resident on the device in stencil-BSR
form. Assembling the (nb, mb, mb) blocks on device from the stencil avoids
shipping hundreds of MB of dense factors through the host (which is the
dominant setup cost on remote-attached TPUs), and the factorization itself
(batched Cholesky → explicit inverse) runs on the MXU.

Index convention: lane-major throughout. Blocks are stored 5-D
(nb, br, mbn, br, mbn) with node-local index minor, matching the (t, br, nrb)
panel layout, so the apply is one batched einsum with NO gathers/permutes:

    w[t, b, m, r] = Σ_{k,s} inv[b, m, r, k, s] · z[t, b, k, s]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def dense_blocks_from_stencil(blocks_t: jax.Array, offsets, mbn: int) -> jax.Array:
    """(S, br, br, nrb) stencil -> (nb, br, mbn, br, mbn) dense diagonal
    blocks, nb = nrb // mbn (must divide). Couplings that cross block
    boundaries are dropped (that's what makes it block-Jacobi)."""
    s_max, br, _, nrb = blocks_t.shape
    assert nrb % mbn == 0, "mbn must divide the node count"
    nb = nrb // mbn

    r = jnp.arange(nrb)
    b_idx = r // mbn
    rl = r % mbn
    dense = jnp.zeros((nb, br, mbn, br, mbn), blocks_t.dtype)
    for s, off in enumerate(offsets):
        tgt = rl + off
        valid = (tgt >= 0) & (tgt < mbn)
        tgt_safe = jnp.clip(tgt, 0, mbn - 1)
        for m in range(br):
            for k in range(br):
                vals = jnp.where(valid, blocks_t[s, m, k], 0.0)
                dense = dense.at[b_idx, m, rl, k, tgt_safe].add(vals)
    return dense


def batched_spd_inverse(dense5: jax.Array, method: str = "chol") -> jax.Array:
    """Explicit inverse of each (mb × mb) SPD block; input/output 5-D
    lane-major layout (see module docstring)."""
    nb, br, mbn, _, _ = dense5.shape
    mb = br * mbn
    a = dense5.reshape(nb, mb, mb)
    if method == "chol":
        chol = jax.lax.linalg.cholesky(a, symmetrize_input=True)
        eye = jnp.broadcast_to(jnp.eye(mb, dtype=a.dtype), (nb, mb, mb))
        linv = jax.lax.linalg.triangular_solve(
            chol, eye, left_side=True, lower=True, transpose_a=False
        )
        inv = jnp.einsum("bki,bkj->bij", linv, linv, precision=HIGHEST)
    elif method == "newton":
        # Newton–Schulz: X_{k+1} = X_k (2I − A X_k); init guarantees
        # convergence for SPD A. Pure batched GEMMs — MXU-friendly.
        norm1 = jnp.max(jnp.sum(jnp.abs(a), axis=2), axis=1)
        x = (a / (norm1 * norm1)[:, None, None]).transpose(0, 2, 1)
        eye2 = 2.0 * jnp.eye(mb, dtype=a.dtype)

        def body(_, x):
            ax = jnp.einsum("bij,bjk->bik", a, x, precision=HIGHEST)
            return jnp.einsum("bij,bjk->bik", x, eye2[None] - ax, precision=HIGHEST)

        x = jax.lax.fori_loop(0, 50, body, x)
        inv = 0.5 * (x + jnp.swapaxes(x, 1, 2))
    else:
        raise ValueError(f"unknown method {method!r}")
    return inv.reshape(nb, br, mbn, br, mbn)


def bj_apply_lane_major(inv5: jax.Array, z: jax.Array) -> jax.Array:
    """z: (t, br, nrb) -> (t, br, nrb) with nrb = nb*mbn."""
    nb, br, mbn, _, _ = inv5.shape
    t = z.shape[0]
    zb = z.reshape(t, br, nb, mbn).transpose(0, 2, 1, 3)       # (t, nb, br, mbn)
    w = jnp.einsum("bmrks,tbks->tbmr", inv5, zb, precision=HIGHEST)
    return w.transpose(0, 2, 1, 3).reshape(t, br, nb * mbn)


def build_device_block_jacobi(blocks_t, offsets, mbn: int, method: str = "chol"):
    """Stencil -> explicit block inverses, entirely on device."""
    dense = dense_blocks_from_stencil(blocks_t, offsets, mbn)
    return batched_spd_inverse(dense, method)
