"""Worker process for the 2-process jax.distributed CPU smoke test.

Launched by tests/test_distributed.py::TestMultihostGlue::test_two_process_solve
— the TPU-native analog of the reference's `mpirun -np N` discipline
(reference: README.md:53, make.inc:25): two OS processes, each owning 4
virtual CPU devices, wired into ONE 8-device (host × chip) mesh via
`jax.distributed.initialize`, then a genuinely distributed solve whose
collectives cross the process boundary (the DCN analog).

Usage: python tests/_multihost_worker.py <coordinator> <nproc> <pid>
Prints "MULTIHOST_OK relres=<r>" on success (each process).
"""

import os
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from prealps_tpu.parallel import multihost

    multihost.initialize(coordinator=coord, num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert multihost.is_coordinator() == (pid == 0)

    mesh = multihost.global_mesh_2level()
    assert mesh.devices.shape == (nproc, 4), mesh.devices.shape

    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    # deterministic SPD problem, identical on every process (the reference
    # reads the same .mtx on every rank's root; panels ship over MPI —
    # operator.c:38; here make_global materialises each process's shards)
    n = 512
    main_d = 2.0 + 0.1 * (1 + np.arange(n) % 7)
    a = sp.diags([-np.ones(n - 1), main_d, -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    # dense row panels sharded over BOTH axes (rows split across the 8
    # devices); x replicated — SpMV = local GEMV + no comm; dots = psum
    # over host (DCN analog) AND chip (ICI analog) axes
    a_dense = a.toarray()
    a_g = multihost.make_global(mesh, P(("host", "chip"), None), a_dense)
    b_g = multihost.make_global(mesh, P(("host", "chip")), b)

    @jax.jit
    def solve(a_loc_g, b_loc_g):
        def body(a_loc, b_loc):
            def psum2(v):
                return jax.lax.psum(jax.lax.psum(v, "chip"), "host")

            def matvec(x_full):
                return a_loc @ x_full

            def dot(u_loc, v_loc):
                return psum2(jnp.vdot(u_loc, v_loc))

            x_loc = jnp.zeros_like(b_loc)
            r_loc = b_loc
            p_full = jax.lax.all_gather(
                r_loc, "chip", axis=0, tiled=True)
            p_full = jax.lax.all_gather(p_full, "host", axis=0, tiled=True)
            rs = dot(r_loc, r_loc)

            def step(carry, _):
                x_loc, r_loc, p_full, rs = carry
                ap_loc = matvec(p_full)
                p_loc = jax.lax.dynamic_slice(
                    p_full,
                    ((jax.lax.axis_index("host") * 4
                      + jax.lax.axis_index("chip")) * r_loc.shape[0],),
                    (r_loc.shape[0],))
                alpha = rs / dot(p_loc, ap_loc)
                x_loc = x_loc + alpha * p_loc
                r_loc = r_loc - alpha * ap_loc
                rs_new = dot(r_loc, r_loc)
                beta = rs_new / rs
                p_loc_new = r_loc + beta * p_loc
                p_full = jax.lax.all_gather(
                    p_loc_new, "chip", axis=0, tiled=True)
                p_full = jax.lax.all_gather(p_full, "host", axis=0,
                                            tiled=True)
                return (x_loc, r_loc, p_full, rs_new), rs_new

            (x_loc, r_loc, _, rs), _ = jax.lax.scan(
                step, (x_loc, r_loc, p_full, rs), None, length=200)
            return x_loc, rs

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(("host", "chip"), None), P(("host", "chip"))),
            out_specs=(P(("host", "chip")), P()),
        )(a_loc_g, b_loc_g)

    x_g, rs = solve(a_g, b_g)
    # every process holds the replicated ||r||^2; fetch the local shards of
    # x and verify the TRUE residual of the locally-owned rows
    rs_val = float(np.asarray(jax.device_get(rs)))
    relres_rec = float(np.sqrt(rs_val) / np.linalg.norm(b))
    x_local = np.concatenate(
        [np.asarray(s.data).ravel() for s in
         sorted(x_g.addressable_shards, key=lambda s: s.index[0].start)])
    # true residual needs the FULL x: gather the per-process pieces on host
    from jax.experimental import multihost_utils

    x_full = multihost_utils.process_allgather(
        x_local, tiled=True) if nproc > 1 else x_local
    relres_true = float(np.linalg.norm(b - a @ x_full) / np.linalg.norm(b))
    assert relres_true < 1e-10, (relres_true, relres_rec)
    assert abs(relres_rec - relres_true) < 1e-8
    print(f"MULTIHOST_OK relres={relres_true:.3e}", flush=True)


if __name__ == "__main__":
    main()
