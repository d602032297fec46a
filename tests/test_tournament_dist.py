"""Cross-shard tournament pivoting over the 8-device mesh
(reference: utils/iterativeKernels/tournamentPivoting{,QR}.c reduction tree)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from prealps_tpu.ops.tournament import (
    tournament_select_sharded,
    tp_qr_sharded,
)
from prealps_tpu.parallel.mesh import make_mesh

AXIS = "shards"


def _low_rank_plus_noise(rng, m, n, rank, noise=1e-6):
    u = rng.standard_normal((m, rank))
    v = rng.standard_normal((rank, n))
    scale = np.logspace(0, -3, rank)[:, None]
    return u @ (scale * v) + noise * rng.standard_normal((m, n))


class TestShardedTournament:
    def test_select_finds_dominant_columns(self, rng):
        m, n, k = 96, 64, 6
        mesh = make_mesh(8, AXIS)
        a = _low_rank_plus_noise(rng, m, n, rank=6)
        # plant 6 dominant columns at known global positions
        strong = rng.standard_normal((m, 6)) * 50.0
        pos = np.array([0, 11, 22, 33, 44, 55])
        a[:, pos] = strong

        fn = jax.jit(
            _shard_map(
                lambda al: tournament_select_sharded(al, AXIS, k),
                mesh=mesh, in_specs=(P(None, AXIS),), out_specs=P(),
                check_vma=False,
            )
        )
        cols = np.sort(np.asarray(fn(jnp.asarray(a))))
        assert set(cols.tolist()) == set(pos.tolist()), cols

    def test_matches_single_device_quality(self, rng):
        """Distributed selection must give a basis as good as the local
        tournament: projection residual within a small factor."""
        from prealps_tpu.ops.tournament import tournament_select

        m, n, k = 80, 48, 8
        mesh = make_mesh(8, AXIS)
        a = _low_rank_plus_noise(rng, m, n, rank=16, noise=1e-3)
        a_d = jnp.asarray(a)

        fn = jax.jit(
            _shard_map(
                lambda al: tournament_select_sharded(al, AXIS, k),
                mesh=mesh, in_specs=(P(None, AXIS),), out_specs=P(),
                check_vma=False,
            )
        )
        cols_d = np.asarray(fn(a_d))
        cols_s = np.asarray(tournament_select(a_d, k))

        def resid(cols):
            c = a[:, cols]
            q, _ = np.linalg.qr(c)
            return np.linalg.norm(a - q @ (q.T @ a))

        assert resid(cols_d) <= 3 * resid(cols_s) + 1e-12

    def test_tp_qr_sharded_reconstruction(self, rng):
        m, n, k = 120, 64, 10
        mesh = make_mesh(8, AXIS)
        a = _low_rank_plus_noise(rng, m, n, rank=10, noise=1e-9)

        fn = jax.jit(
            _shard_map(
                lambda al: tp_qr_sharded(al, AXIS, k),
                mesh=mesh, in_specs=(P(None, AXIS),),
                out_specs=(P(), P(None, AXIS), P()),
                check_vma=False,
            )
        )
        q, r, cols = fn(jnp.asarray(a))
        q, r = np.asarray(q), np.asarray(r)
        # q orthonormal, Q R ≈ A (a is numerically rank ~10)
        np.testing.assert_allclose(q.T @ q, np.eye(k), atol=1e-8)
        err = np.linalg.norm(a - q @ r) / np.linalg.norm(a)
        assert err < 1e-6, err
        assert np.unique(np.asarray(cols)).size == k
