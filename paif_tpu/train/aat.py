"""Joint training and Adversarial-Aware Training (AAT).

Reference loss surface: Network_MM_Searched._loss (0.1*fusion + 4*seg CE,
model_fusion_auto.py:1093-1100) and ._loss_coupled (forward on PERTURBED
inputs, fusion loss against CLEAN targets — the AAT hook, :1102-1109), fed by
the coupled Fusion_dataset_Meta loader. The reference does not ship a train
script; this module provides the full TPU loop: the PGD perturbation
generation runs INSIDE the jitted train step (stop_gradiented), so one XLA
program does attack + forward + backward + update.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from paif_tpu.attack.pgd import AttackConfig, _init_delta, _project, seg_attack_loss
from paif_tpu.losses.fusion import fusion_loss_grad2
from paif_tpu.ops.color import rgb_to_ycrcb
from paif_tpu.ops.losses import cross_entropy_ignore
from paif_tpu.ops.resize import resize_bilinear
from paif_tpu.train.optimizer import poly_warmup_adamw

FusionLossFn = Callable[..., jnp.ndarray]


@dataclass(frozen=True)
class TrainConfig:
    fusion_weight: float = 0.1
    seg_weight: float = 4.0
    learning_rate: float = 8e-5
    warmup_iter: int = 3000
    max_iter: int = 160000
    warmup_ratio: float = 1e-5
    power: float = 1.0
    weight_decay: float = 0.01
    attack: Optional[AttackConfig] = None  # set -> AAT with on-the-fly PGD


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            opt_state=opt_state,
        )


def create_train_state(model, variables, cfg: TrainConfig) -> TrainState:
    tx = poly_warmup_adamw(
        cfg.learning_rate,
        cfg.warmup_iter,
        cfg.max_iter,
        cfg.warmup_ratio,
        cfg.power,
        cfg.weight_decay,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def joint_loss(
    model,
    params,
    batch_stats,
    ir,
    vis,
    mask,
    labels,
    key,
    fusion_loss_fn: FusionLossFn = fusion_loss_grad2,
    fusion_weight: float = 0.1,
    seg_weight: float = 4.0,
    clean_ir=None,
    clean_vis=None,
):
    """0.1*fusion + 4*seg CE. If clean_* are given (AAT coupled mode), the
    fusion loss targets the clean pair while the forward ran on (ir, vis)."""
    (fused, seg), mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        ir,
        vis,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": key, "droppath": jax.random.fold_in(key, 1)},
    )
    outputs = resize_bilinear(seg, labels.shape[1:3], align_corners=False)
    seg_ce = cross_entropy_ignore(outputs, labels)
    t_ir = clean_ir if clean_ir is not None else ir
    t_vis = clean_vis if clean_vis is not None else vis
    enhance = fusion_loss_fn(t_ir, rgb_to_ycrcb(t_vis), fused, mask)
    total = fusion_weight * enhance + seg_weight * seg_ce
    return total, (mut["batch_stats"], {"loss": total, "seg_ce": seg_ce, "fusion": enhance})


def make_train_step(model, cfg: TrainConfig, fusion_loss_fn: FusionLossFn = fusion_loss_grad2):
    """Standard joint train step: fn(state, ir, vis, mask, labels, key)."""

    def loss_fn(params, state, ir, vis, mask, labels, key):
        return joint_loss(
            model, params, state.batch_stats, ir, vis, mask, labels, key,
            fusion_loss_fn, cfg.fusion_weight, cfg.seg_weight,
        )

    @jax.jit
    def step(state: TrainState, ir, vis, mask, labels, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(state.params, state, ir, vis, mask, labels, key)
        return state.apply_gradients(grads, new_bs), metrics

    return step


def make_aat_train_step(model, cfg: TrainConfig, fusion_loss_fn: FusionLossFn = fusion_loss_grad2):
    """AAT: per step, craft PGD perturbations against the CURRENT params
    (eval-mode forward, gradients stopped), then optimize the coupled loss —
    forward on perturbed inputs, fusion loss against the clean pair.

    One jitted program: K attack fwd+bwd + 1 training fwd+bwd + update.
    """
    atk = cfg.attack or AttackConfig()

    def eval_apply(params, batch_stats, ir, vis):
        return model.apply({"params": params, "batch_stats": batch_stats}, ir, vis)

    def craft(params, batch_stats, ir, vis, labels, key):
        k1, k2 = jax.random.split(key)
        d_ir = _init_delta(k1, ir, atk.epsilon, atk.init)
        d_vis = _init_delta(k2, vis, atk.epsilon, atk.init)

        def attack_loss(d_ir, d_vis, step_i):
            _, seg = eval_apply(params, batch_stats, ir + d_ir, vis + d_vis)
            return seg_attack_loss(seg, labels, atk.way, step_i, atk.iters)

        def body(i, carry):
            di, dv = carry
            gi, gv = jax.grad(attack_loss, argnums=(0, 1))(di, dv, i)
            di = _project(di + atk.alpha * jnp.sign(gi), ir, atk.epsilon)
            dv = _project(dv + atk.alpha * jnp.sign(gv), vis, atk.epsilon)
            return di, dv

        d_ir, d_vis = jax.lax.fori_loop(0, atk.iters, body, (d_ir, d_vis))
        return jax.lax.stop_gradient(d_ir), jax.lax.stop_gradient(d_vis)

    def loss_fn(params, state, ir_p, vis_p, ir, vis, mask, labels, key):
        return joint_loss(
            model, params, state.batch_stats, ir_p, vis_p, mask, labels, key,
            fusion_loss_fn, cfg.fusion_weight, cfg.seg_weight,
            clean_ir=ir, clean_vis=vis,
        )

    @jax.jit
    def step(state: TrainState, ir, vis, mask, labels, key):
        k_atk, k_train = jax.random.split(key)
        d_ir, d_vis = craft(state.params, state.batch_stats, ir, vis, labels, k_atk)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state, ir + d_ir, vis + d_vis, ir, vis, mask, labels, k_train
        )
        return state.apply_gradients(grads, new_bs), metrics

    return step
