from helen_tpu.parallel.mesh import make_mesh, mesh_shape_for
from helen_tpu.parallel.sharding import (
    make_sharded_consensus_fn,
    make_sharded_train_step,
    param_partition_specs,
    shard_params,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "make_sharded_consensus_fn",
    "make_sharded_train_step",
    "param_partition_specs",
    "shard_params",
]
