"""Optimizer schedule parity + train-step smoke tests."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from paif_tpu.train.optimizer import (
    param_group_adamw,
    poly_warmup_adamw,
    poly_warmup_schedule,
    segformer_param_label,
)


def test_poly_warmup_schedule_matches_reference():
    """Compare against the reference PolyWarmupAdamW lr trajectory
    (utils/optimizer.py:16-33) on a tiny torch model."""
    import sys

    sys.path.insert(0, "/root/reference")
    from utils.optimizer import PolyWarmupAdamW

    lin = torch.nn.Linear(2, 2)
    opt = PolyWarmupAdamW(
        lin.parameters(), lr=8e-5, weight_decay=0.01, betas=(0.9, 0.999),
        warmup_iter=10, max_iter=100, warmup_ratio=1e-5, power=1.0,
    )
    sched = poly_warmup_schedule(8e-5, 10, 100, 1e-5, 1.0)
    for step in range(30):
        lin(torch.zeros(1, 2)).sum().backward()
        opt.step()  # sets lr for `step`, then increments
        ref_lr = opt.param_groups[0]["lr"]
        got = float(sched(step))  # schedule computes in f32
        assert abs(got - ref_lr) <= max(2e-3 * abs(ref_lr), 1e-12), f"step {step}: {got} vs {ref_lr}"


def test_resume_schedule_offset():
    s = poly_warmup_schedule(1e-4, 10, 100, 1e-5, 1.0)
    tx = poly_warmup_adamw(1e-4, 10, 100, 1e-5, 1.0, init_step=50)
    # the resumed optimizer's step-0 lr equals the fresh schedule at step 50
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    # lr at resumed step-0 ~ s(50); update magnitude ratio against a fresh tx
    fresh = poly_warmup_adamw(1e-4, 10, 100, 1e-5, 1.0)
    fstate = fresh.init(params)
    fupdates, _ = fresh.update({"w": jnp.ones(3)}, fstate, params)
    ratio = float(updates["w"][0] / fupdates["w"][0])
    assert abs(ratio - float(s(50) / s(0))) < 1e-3


def test_param_group_labels_and_transform():
    params = {
        "encoder": {"block1_0": {"norm1": {"scale": jnp.ones(4)}, "attn": {"q": {"kernel": jnp.ones((4, 4))}}}},
        "decoder": {"linear_pred": {"kernel": jnp.ones((4, 9))}},
    }
    labels = jax.tree_util.tree_map_with_path(segformer_param_label, params)
    assert labels["encoder"]["block1_0"]["norm1"]["scale"] == "encoder_norm"
    assert labels["encoder"]["block1_0"]["attn"]["q"]["kernel"] == "encoder"
    assert labels["decoder"]["linear_pred"]["kernel"] == "decoder"
    tx = param_group_adamw(params, lr_mults={"encoder_norm": 0.0})
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["encoder"]["block1_0"]["norm1"]["scale"]).max()) == 0.0
    assert float(jnp.abs(updates["decoder"]["linear_pred"]["kernel"]).max()) > 0.0


def test_joint_train_step_decreases_loss(rng):
    """A few joint train steps on a tiny model should reduce the loss."""
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint
    from paif_tpu.train.aat import TrainConfig, create_train_state, make_train_step

    model = PAIFJoint(backbone="mit_b0", num_classes=9, fusion=lambda: FusionNetSearched(8, PAIF_GENOTYPE))
    ir = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    mask = jnp.maximum(ir, jnp.mean(vis, -1, keepdims=True))
    labels = jnp.asarray(rng.integers(0, 9, (2, 32, 32)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ir, vis)
    cfg = TrainConfig(learning_rate=1e-3, warmup_iter=1, max_iter=100)
    state = create_train_state(model, variables, cfg)
    step = make_train_step(model, cfg)
    losses = []
    for i in range(12):
        state, metrics = step(state, ir, vis, mask, labels, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[4:]) < losses[0], losses
    assert int(state.step) == 12
