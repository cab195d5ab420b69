"""Device-mesh parallelism: DP sharding helpers, TP shardings, 2-stage PP."""

from paif_tpu.parallel.pp import make_pp_forward
from paif_tpu.parallel.tp import make_2d_mesh, shard_params_tp
from paif_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "replicated_sharding",
    "make_2d_mesh",
    "shard_params_tp",
]
