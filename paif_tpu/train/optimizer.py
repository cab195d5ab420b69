"""PolyWarmupAdamW as an optax schedule + optimizer.

Reference: utils/optimizer.py:3-33 — linear warmup
lr_mult = 1 - (1 - t/T_w)(1 - ratio) for t < T_w, then polynomial decay
(1 - t/T)^power; past T the last value persists. Defaults match
configs/voc.yaml (AdamW betas (0.9,0.999), wd 0.01, eps 1e-8).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def poly_warmup_schedule(
    base_lr: float,
    warmup_iter: int = 3000,
    max_iter: int = 160000,
    warmup_ratio: float = 1e-5,
    power: float = 1.0,
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = 1.0 - (1.0 - step / warmup_iter) * (1.0 - warmup_ratio)
        t = jnp.minimum(step, max_iter - 1)
        poly = (1.0 - t / max_iter) ** power
        return base_lr * jnp.where(step < warmup_iter, warm, poly)

    return schedule


def poly_warmup_adamw(
    base_lr: float = 8e-5,
    warmup_iter: int = 3000,
    max_iter: int = 160000,
    warmup_ratio: float = 1e-5,
    power: float = 1.0,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = None,
    init_step: int = 0,
) -> optax.GradientTransformation:
    """init_step > 0 resumes the LR schedule mid-run — the reference's
    PolyWarmupAdamW_seg(iter_curr=...) (utils/optimizer.py:36-47)."""
    sched = poly_warmup_schedule(base_lr, warmup_iter, max_iter, warmup_ratio, power)
    if init_step:
        base = sched
        sched = lambda step: base(step + init_step)  # noqa: E731
    tx = optax.adamw(sched, b1=b1, b2=b2, eps=1e-8, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def segformer_param_label(path: tuple, _leaf) -> str:
    """WeTr.get_param_groups semantics (core/model.py:36-52): encoder params
    whose name contains 'norm' form group 1, other encoder params group 0,
    decoder (+classifier) group 2. Use with param_group_adamw."""
    parts = [str(p) for p in path]
    in_encoder = any("encoder" in p for p in parts)
    if in_encoder:
        return "encoder_norm" if any("norm" in p.lower() for p in parts) else "encoder"
    return "decoder"


def param_group_adamw(
    params,
    base_lr: float = 8e-5,
    lr_mults: Optional[dict] = None,
    label_fn=segformer_param_label,
    **kwargs,
) -> optax.GradientTransformation:
    """Per-group LR multipliers over the poly-warmup AdamW (the reference
    keeps 3 groups with a shared schedule; mults default to 1.0)."""
    import jax

    lr_mults = lr_mults or {}
    labels = jax.tree_util.tree_map_with_path(label_fn, params)
    groups = set(jax.tree_util.tree_leaves(labels))
    txs = {
        g: poly_warmup_adamw(base_lr * lr_mults.get(g, 1.0), **kwargs) for g in groups
    }
    return optax.multi_transform(txs, labels)
