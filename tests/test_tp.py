"""Tensor-parallel sharding: a (data=2, model=4) mesh must reproduce the
unsharded SegFormer output exactly (XLA SPMD inserts the collectives)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from paif_tpu.models import SegFormer
from paif_tpu.parallel.mesh import data_sharding
from paif_tpu.parallel.tp import make_2d_mesh, shard_params_tp, _tp_spec


def test_tp_spec_rules():
    class K:  # mimic jax KeyPath entries
        def __init__(self, key):
            self.key = key

    path = tuple(K(p) for p in ("encoder", "block3_0", "attn", "q", "kernel"))
    assert _tp_spec(path) == jax.sharding.PartitionSpec(None, "model")
    path = tuple(K(p) for p in ("encoder", "block3_0", "mlp", "fc2", "kernel"))
    assert _tp_spec(path) == jax.sharding.PartitionSpec("model", None)
    path = tuple(K(p) for p in ("encoder", "norm1", "scale"))
    assert _tp_spec(path) == jax.sharding.PartitionSpec()


def test_tp_forward_matches_unsharded(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    model = SegFormer(backbone="mit_b0", num_classes=9)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x))

    mesh = make_2d_mesh(dp=2, tp=4)
    v_tp = shard_params_tp(mesh, variables)
    x_tp = jax.device_put(x, data_sharding(mesh))
    got = np.asarray(jax.jit(model.apply)(v_tp, x_tp))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # some parameters actually got model-sharded (not everything replicated)
    flat = jax.tree_util.tree_leaves_with_path(v_tp["params"])
    sharded = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, leaf in flat
        if "model" in str(leaf.sharding.spec)
    ]
    assert any("fc1/kernel" in s for s in sharded), sharded[:5]
