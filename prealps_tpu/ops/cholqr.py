"""A-CholQR and CholQR block orthonormalisation.

(reference: utils/cholqr.c — CPLM_MatDenseACholQR / CPLM_MatDenseANormalize /
CPLM_MatDenseCholQR; ECG inlines its own copy, ecg.c:307-328.) One fused
step: tall-skinny Gram + cross-shard psum + small Cholesky + triangular
solves — the canonical communication-avoiding orthonormalisation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from prealps_tpu.ops.blockops import psum
from prealps_tpu.solvers.panels import LAYOUTS


def a_cholqr(p: jax.Array, ap: jax.Array, axis_name: Optional[str] = None,
             layout: str = "nt"):
    """A-orthonormalise P (and keep AP consistent): returns (P̃, ÃP, U) with
    P̃ᵀAP̃ = I and U the upper Cholesky factor of PᵀAP."""
    ops = LAYOUTS[layout]
    c = psum(ops.gram(ap, p), axis_name)
    u = jnp.swapaxes(jax.lax.linalg.cholesky(c, symmetrize_input=True), -1, -2)
    return ops.right_solve(u, p), ops.right_solve(u, ap), u


def cholqr(p: jax.Array, axis_name: Optional[str] = None, layout: str = "nt"):
    """Plain CholQR: returns (Q, R) with QᵀQ = I (one pass)."""
    ops = LAYOUTS[layout]
    c = psum(ops.gram(p, p), axis_name)
    r = jnp.swapaxes(jax.lax.linalg.cholesky(c, symmetrize_input=True), -1, -2)
    return ops.right_solve(r, p), r


def cholqr2(p: jax.Array, axis_name: Optional[str] = None, layout: str = "nt"):
    """CholQR2 (two passes): numerically robust to κ(P) ≈ 1/sqrt(eps)."""
    q1, r1 = cholqr(p, axis_name, layout)
    q2, r2 = cholqr(q1, axis_name, layout)
    return q2, jnp.einsum("ij,jk->ik", r2, r1, precision=jax.lax.Precision.HIGHEST)


def a_normalize(p: jax.Array, ap: jax.Array, axis_name: Optional[str] = None,
                layout: str = "nt"):
    """Scale each direction to unit A-norm (reference: cholqr.c:35
    CPLM_MatDenseANormalize)."""
    ops = LAYOUTS[layout]
    diag = jnp.diag(psum(ops.gram(ap, p), axis_name))
    scale = 1.0 / jnp.sqrt(jnp.maximum(diag, jnp.finfo(p.dtype).tiny))
    return ops.scale_dirs(p, scale), ops.scale_dirs(ap, scale)
