"""Pipeline parallelism: 2-stage GPipe forward over a (data, pp) mesh ==
the single-device joint forward (f32, tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from paif_tpu.models import FusionNetSearched, PAIFJoint
from paif_tpu.parallel.pp import (
    make_pp_forward,
    make_pp_forward_multijit,
    split_variables_pp,
)


def _mesh_2x2():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    return Mesh(np.asarray(devs[:4]).reshape(2, 2), axis_names=("data", "pp"))


@pytest.mark.parametrize("microbatches", [1, 2])
def test_pp_forward_matches_single_device(microbatches):
    model = PAIFJoint(
        backbone="mit_b0", num_classes=9, fusion=lambda: FusionNetSearched(8)
    )
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ir[:1], vis[:1])

    fused_ref, seg_ref = model.apply(variables, ir, vis)

    mesh = _mesh_2x2()
    # global batch 8 = 2 data shards x microbatches x mb
    pp_fwd = make_pp_forward(model, mesh, microbatches=microbatches)
    with mesh:
        fused_pp, seg_pp = jax.jit(pp_fwd)(variables, ir, vis)

    np.testing.assert_allclose(np.asarray(fused_pp), np.asarray(fused_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(seg_pp), np.asarray(seg_ref), rtol=2e-4, atol=2e-4)


def test_pp_multijit_composes_dp_tp():
    """DP x TP x PP: per-stage submeshes, stage-1 params genuinely TP-sharded
    (Megatron all-reduces live inside the stage program), outputs equal the
    single-device forward."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    from paif_tpu.parallel.mesh import replicate
    from paif_tpu.parallel.tp import shard_params_tp

    model = PAIFJoint(
        backbone="mit_b0", num_classes=9, fusion=lambda: FusionNetSearched(8)
    )
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ir[:1], vis[:1])
    fused_ref, seg_ref = model.apply(variables, ir, vis)

    mesh0 = Mesh(np.asarray(devs[:4]).reshape(2, 2), axis_names=("data", "model"))
    mesh1 = Mesh(np.asarray(devs[4:8]).reshape(2, 2), axis_names=("data", "model"))
    v0, v1 = split_variables_pp(variables)
    v0 = replicate(mesh0, v0)
    v1 = shard_params_tp(mesh1, v1)
    n_tp = sum(
        1
        for leaf in jax.tree_util.tree_leaves(v1)
        if "model" in str(getattr(leaf.sharding, "spec", ""))
    )
    assert n_tp > 0, "no stage-1 params TP-sharded"

    fwd = make_pp_forward_multijit(model, mesh0, mesh1)
    fused_pp, seg_pp = fwd(v0, v1, ir, vis, microbatches=2)
    np.testing.assert_allclose(np.asarray(fused_pp), np.asarray(fused_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(seg_pp), np.asarray(seg_ref), rtol=2e-4, atol=2e-4)
