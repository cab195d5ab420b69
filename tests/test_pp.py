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


def test_pp_train_step_matches_grad_accum():
    """GPipe training step (per-stage submeshes, recompute backward) ==
    sequential gradient accumulation over the same microbatches on a single
    device: chained BN stats, per-microbatch grads at their own stats,
    averaged, one AdamW update."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    from paif_tpu.losses.fusion import fusion_loss_grad2
    from paif_tpu.parallel.pp import make_pp_train_step
    from paif_tpu.train.aat import TrainConfig, create_train_state, joint_loss

    model = PAIFJoint(
        backbone="mit_b0", num_classes=9, fusion=lambda: FusionNetSearched(8)
    )
    rng = np.random.default_rng(0)
    B, M = 4, 2
    ir = jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 3)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 9, (B, 32, 32)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ir[:1], vis[:1])
    tcfg = TrainConfig(learning_rate=1e-3, warmup_iter=1, max_iter=10)
    key = jax.random.PRNGKey(7)

    # reference: sequential grad accumulation, single device
    state_ref = create_train_state(model, variables, tcfg)
    stats = state_ref.batch_stats
    mb = B // M
    grads = None
    for t in range(M):
        sl = slice(t * mb, (t + 1) * mb)

        def loss_fn(p, stats=stats, sl=sl, t=t):
            return joint_loss(
                model, p, stats, ir[sl], vis[sl], mask[sl], labels[sl],
                jax.random.fold_in(key, t), fusion_loss_grad2, 0.1, 4.0,
            )

        (_, (stats, _m)), g = jax.value_and_grad(loss_fn, has_aux=True)(state_ref.params)
        grads = g if grads is None else jax.tree_util.tree_map(jnp.add, grads, g)
    grads = jax.tree_util.tree_map(lambda x: x / M, grads)
    state_ref = state_ref.apply_gradients(grads, stats)

    # PP: stage submeshes of 2 devices each
    from jax.sharding import Mesh as _Mesh

    mesh0 = _Mesh(np.asarray(devs[:2]), axis_names=("data",))
    mesh1 = _Mesh(np.asarray(devs[2:4]), axis_names=("data",))
    v0, v1 = split_variables_pp(variables)
    state0 = create_train_state(model, v0, tcfg)
    state1 = create_train_state(model, v1, tcfg)
    step = make_pp_train_step(model, mesh0, mesh1, fusion_loss_grad2, 0.1, 4.0)
    state0, state1, metrics = step(state0, state1, ir, vis, mask, labels, key, M)

    ref0, ref1 = split_variables_pp({"params": state_ref.params})
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        state0.params, ref0["params"],
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        state1.params, ref1["params"],
    )
    # chained BN stats must match too
    ref_s0, _ = split_variables_pp({"batch_stats": state_ref.batch_stats})
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        state0.batch_stats, ref_s0["batch_stats"],
    )
    assert np.isfinite(float(metrics["loss"]))
