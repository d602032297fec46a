"""Device-mesh parallelism: sharded operators and drivers.

Replaces the reference's raw-MPI distribution (reference: utils/operator.c +
cplm_v0_matmult_v2.c halo SpMM + MPI_Allreduce in ecg.c) with shard_map over
a jax.sharding.Mesh: row-sharded operator panels, all-gather/psum collectives
inside one jitted solve.
"""

from prealps_tpu.parallel.mesh import make_mesh
from prealps_tpu.parallel.driver import DistributedECG

__all__ = ["make_mesh", "DistributedECG"]
