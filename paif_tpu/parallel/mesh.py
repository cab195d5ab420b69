"""Mesh + sharding utilities.

The PAIF workload is ~45M params at 480x640 — data parallelism over ICI is
the right (and sufficient) decomposition: batch dim sharded over the 'data'
axis, parameters replicated, metric reductions (confusion matrices, losses)
left to XLA's SPMD partitioner, which turns them into psums over ICI.

The reference has NO working parallelism (its --backend nccl flag is dead,
robust_test.py:32-33); this module is the TPU-native replacement. The mesh
is 1-D by default but the helpers accept any axis layout so TP/PP can be
added without touching call sites.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=(axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place a pytree of host arrays with the batch dim sharded over the mesh.

    Non-array leaves (e.g. filename lists) pass through untouched. Batch
    sizes must be divisible by the mesh size — use data.pipeline.pad_to_batch.

    Multi-host: when running under `jax.distributed` (process_count > 1),
    each host passes its PROCESS-LOCAL rows and the global array is
    assembled from the per-host shards (`make_array_from_process_local_data`
    — no cross-host gather; each host's data lands on its own chips). The
    global batch is then local_batch * process_count.
    """
    sharding = data_sharding(mesh, axis_name)
    multihost = jax.process_count() > 1

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            if multihost:
                return jax.make_array_from_process_local_data(sharding, np.asarray(x))
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (e.g. model variables) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
