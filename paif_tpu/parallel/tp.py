"""Tensor-parallel sharding rules for the SegFormer branch.

Data parallelism is sufficient for PAIF's ~45M params (SURVEY §2.9), but the
mesh abstraction must not preclude TP. This module provides GSPMD-style TP:
a (data, model) mesh and NamedShardings over the MiT parameters — attention
q/kv and Mix-FFN fc1 are column-sharded (output features over 'model'),
proj/fc2 row-sharded (input features over 'model') — the Megatron pattern
where each block needs only one all-reduce per sublayer, which XLA's SPMD
partitioner inserts automatically once the parameters are placed.

Usage:
    mesh = make_2d_mesh(dp=2, tp=4)
    variables = shard_params_tp(mesh, variables)
    batch = shard_batch(mesh, batch)    # leading dim over 'data'
    out = jax.jit(model.apply)(variables, *batch)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-suffix -> PartitionSpec for the kernel (dense kernels are (in, out))
_COL = ("attn/q/kernel", "attn/kv/kernel", "mlp/fc1/kernel")
_ROW = ("attn/proj/kernel", "mlp/fc2/kernel")
_COL_BIAS = ("attn/q/bias", "attn/kv/bias", "mlp/fc1/bias")


def make_2d_mesh(
    dp: int, tp: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, f"need {dp * tp} devices, have {len(devices)}"
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("data", "model"))


def _tp_spec(path: Tuple[str, ...]) -> P:
    joined = "/".join(str(getattr(p, "key", p)) for p in path)
    if any(joined.endswith(s) for s in _COL):
        return P(None, "model")
    if any(joined.endswith(s) for s in _ROW):
        return P("model", None)
    if any(joined.endswith(s) for s in _COL_BIAS):
        return P("model")
    return P()  # replicated


def shard_params_tp(mesh: Mesh, variables: Any) -> Any:
    """Place model variables with Megatron-style TP over the 'model' axis.

    Dimensions that do not divide the axis stay replicated (e.g. mit_b3
    stage-1 dim 64 on an 8-way model axis)."""

    def put(path, x):
        spec = _tp_spec(path)
        # replicate anything the axis size does not divide
        for dim, name in enumerate(spec):
            if name == "model" and x.shape[dim] % mesh.shape["model"] != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, variables)
