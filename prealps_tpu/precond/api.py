"""Preconditioner protocol + factory dispatch.

(reference: src/preconditioners/preAlps_preconditioner.c dispatches a tagged
union {NOPREC, BLOCKJACOBI, LORASC, PRESC}; here the same surface is a
factory returning pytree objects with a jittable .apply.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, runtime_checkable

import jax


@runtime_checkable
class Preconditioner(Protocol):
    def apply(self, z: jax.Array) -> jax.Array:
        """Return M⁻¹ z for an (m, t) local panel."""
        ...


@jax.tree_util.register_pytree_node_class
@dataclass
class Identity:
    """NOPREC."""

    def tree_flatten(self):
        return (), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    def apply(self, z):
        return z


def make_preconditioner(kind: str, a, layout=None, **kwargs):
    """Factory: kind in {none, block_jacobi, lorasc, presc}."""
    kind = kind.lower()
    if kind in ("none", "noprec", "identity"):
        return Identity()
    if kind in ("block_jacobi", "bj", "blockjacobi"):
        from prealps_tpu.precond.block_jacobi import build_block_jacobi

        return build_block_jacobi(a, **kwargs)
    if kind == "lorasc":
        from prealps_tpu.precond.lorasc import build_lorasc

        return build_lorasc(a, **kwargs)
    if kind == "presc":
        from prealps_tpu.precond.presc import build_presc

        return build_presc(a, **kwargs)
    raise ValueError(f"unknown preconditioner {kind!r}")
