"""Two-level block-Jacobi: subdomain inverses + a GenEO-style coarse space.

A TPU-native addition in the spirit of LORASC (which deflates the global
Schur complement's low modes): block Jacobi leaves the inter-block low-energy
modes — for heterogeneous elasticity, near-rigid-body motions of each block —
untouched, which is exactly why its iteration count grows with the block
count (BASELINE.md Table 4). This preconditioner adds a coarse correction

    M⁻¹ = M_BJ⁻¹ + Z A_c⁻¹ Zᵀ,      A_c = Zᵀ A Z,

where Z stacks q low-energy modes PER BLOCK, computed on device by subspace
iteration on the explicit block inverses (the dominant eigenvectors of
A_b⁻¹ are the lowest modes of A_b). The coarse problem is tiny (nb·q) and
solved densely, replicated. Additive combination keeps M SPD for CG.

Everything heavy runs on device; only the (n × q) mode panel is downloaded
once to assemble A_c on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

HIGHEST = jax.lax.Precision.HIGHEST


def block_low_modes(inv5: jax.Array, q: int = 6, iters: int = 6) -> jax.Array:
    """Per-block lowest-mode basis via subspace iteration on the explicit
    inverses. inv5: (nb, br, mbn, br, mbn) -> Y5: (nb, br, mbn, q),
    per-block orthonormal."""
    nb, br, mbn, _, _ = inv5.shape
    mb = br * mbn
    inv = inv5.reshape(nb, mb, mb)

    # deterministic start: per-component translations + index ramps
    y = np.zeros((mb, q), dtype=np.float64)
    comp = np.repeat(np.arange(br), mbn)     # (m, rl) convention: m-major
    ramp = np.tile(np.linspace(-1.0, 1.0, mbn), br)
    for j in range(q):
        c = j % br
        base = (comp == c).astype(np.float64)
        y[:, j] = base if j < br else base * ramp
    y0 = jnp.broadcast_to(jnp.asarray(y, inv.dtype), (nb, mb, q))

    def orthonormalize(yb):
        g = jnp.einsum("bmq,bmr->bqr", yb, yb, precision=HIGHEST)
        g = g + 1e-12 * jnp.eye(q, dtype=yb.dtype)
        l_fac = jax.lax.linalg.cholesky(g, symmetrize_input=True)
        eye = jnp.broadcast_to(jnp.eye(q, dtype=yb.dtype), (nb, q, q))
        linv = jax.lax.linalg.triangular_solve(
            l_fac, eye, left_side=True, lower=True
        )
        return jnp.einsum("bmq,brq->bmr", yb, linv, precision=HIGHEST)

    def body(_, yb):
        yb = jnp.einsum("bmn,bnq->bmq", inv, yb, precision=HIGHEST)
        return orthonormalize(yb)

    y_fin = jax.lax.fori_loop(0, iters, body, orthonormalize(y0))
    return y_fin.reshape(nb, br, mbn, q)


def coarse_matrix_host(a_pad: sp.csr_matrix, y5: np.ndarray, br: int) -> np.ndarray:
    """A_c = Zᵀ A Z on the host (setup only). y5: (nb, br, mbn, q) numpy.
    Z's rows follow the natural padded row ordering (node-major)."""
    nb, _, mbn, q = y5.shape
    mb = br * mbn
    n = a_pad.shape[0]
    assert n == nb * mb
    # (m, rl) -> natural local row rl*br + m
    rows = []
    cols = []
    vals = []
    for b in range(nb):
        blk = y5[b]                       # (br, mbn, q)
        nat = blk.transpose(1, 0, 2).reshape(mb, q)  # (rl, m) -> natural
        r0 = b * mb
        rr, cc = np.nonzero(np.ones((mb, q)))
        rows.append(r0 + rr)
        cols.append(b * q + cc)
        vals.append(nat[rr, cc])
    z = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, nb * q),
    ).tocsr()
    ac = (z.T @ a_pad @ z).toarray()
    return 0.5 * (ac + ac.T)


def coarse_apply(y5, ac_inv, r):
    """Z A_c⁻¹ Zᵀ r in lane-major: r (t, br, nrb) -> same shape."""
    nb, br, mbn, q = y5.shape
    t = r.shape[0]
    rb = r.reshape(t, br, nb, mbn).transpose(0, 2, 1, 3)      # (t, nb, br, mbn)
    c = jnp.einsum("bkrq,tbkr->tbq", y5, rb, precision=HIGHEST)
    c = c.reshape(t, nb * q)
    c = jnp.einsum("tc,cd->td", c, ac_inv, precision=HIGHEST)
    c = c.reshape(t, nb, q)
    w = jnp.einsum("bkrq,tbq->tbkr", y5, c, precision=HIGHEST)
    return w.transpose(0, 2, 1, 3).reshape(t, br, nb * mbn)
