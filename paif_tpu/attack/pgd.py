"""PGD-family adversarial attacks, fully jit-compiled.

Reference: attack/attack.py. There, every PGD step is an un-jitted python
iteration doing a full forward + backward at batch 1 (attack_both :417-514,
attack_vis :517-604, attack_ir :607-689, pgd_attack_ir :117-174,
pgd_attack_vision :177-229, fgsm_ir :247-304, seg_pgd :307-365,
cos_pgd :368-411). Here the whole attack — random init, K gradient steps,
projection — is ONE compiled XLA program (lax.fori_loop over jax.grad w.r.t.
the input deltas), batched over images and shardable over a device mesh.

Semantics preserved from the reference, including its quirks:
  * the epsilon-ball and [0,1]-box projection order (clamp twice to eps,
    then to the box);
  * segPGD/cosPGD/newPGD weightings compare the max *logit value* against the
    integer label (the reference uses torch.max(...).values, not argmax) —
    faithful here because the published robustness numbers use them;
  * 'newPGD' reduces to plain CE: the reference computes cossim_t and
    cossim_f from the same flattened tensor, so their ratio is exactly 1.

Losses: 'l_seg' (CE ignore 255 on logits upsampled to label size), 'l_2',
'l_1', 'l_ssim' on the recombined fused RGB against a clean fusion target;
fgsm_ir additionally takes 'lpips' (reference's dead self-vs-self branch,
kept bug-for-bug) and 'l_perceptual' (working self-contained LPIPS-style
objective, ops/perceptual.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from paif_tpu.ops.color import clip01, minmax_normalize, recombine_chroma, rgb_to_ycrcb, ycrcb_to_rgb
from paif_tpu.ops.losses import cross_entropy_ignore
from paif_tpu.ops.resize import resize_bilinear
from paif_tpu.ops.ssim import ssim

UPPER, LOWER = 1.0, 0.0

# apply_fn(variables, ir, vis) -> (fused_y, seg_logits)
ApplyFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]


@dataclass(frozen=True)
class AttackConfig:
    epsilon: float = 8.0 / 255.0
    alpha: float = 2.0 / 255.0
    iters: int = 5
    restarts: int = 1
    loss: str = "l_seg"  # l_seg | l_2 | l_1 | l_ssim | lpips | l_perceptual
    way: str = "PGD"  # PGD | segPGD | cosPGD | newPGD
    mode: str = "both"  # both | ir | vis
    remat: bool = False  # rematerialize the forward in the grad (memory/VMEM)
    init: str = "uniform"  # uniform | zero (deterministic, e.g. for testing)


def seg_attack_loss(
    seg_logits: jnp.ndarray,
    label: jnp.ndarray,
    way: str,
    step: jnp.ndarray,
    total_iters: int,
) -> jnp.ndarray:
    """Attack objective on stride-4 logits vs (B,H,W) labels."""
    outputs = resize_bilinear(seg_logits, label.shape[1:3], align_corners=False)
    ce = cross_entropy_ignore(outputs, label)
    if way == "PGD":
        return ce
    if way == "segPGD":
        lamb = (step.astype(outputs.dtype) - 1.0) / (total_iters * 2.0)
        pred = jnp.max(outputs, axis=-1)
        mask_t = (pred == label.astype(pred.dtype)).astype(outputs.dtype)[..., None]
        mask_f = 1.0 - mask_t
        return (1.0 - lamb) * cross_entropy_ignore(mask_t * outputs, label) + lamb * (
            cross_entropy_ignore(mask_f * outputs, label)
        )
    if way == "cosPGD":
        pred = jnp.max(outputs, axis=-1).reshape(-1)
        lab = label.astype(pred.dtype).reshape(-1)
        cos = jnp.vdot(pred, lab) / (
            jnp.linalg.norm(pred) * jnp.linalg.norm(lab) + 1e-12
        )
        return cos * ce
    if way == "newPGD":
        # The reference's cossim_t/cossim_f use the same tensor -> ratio == 1.
        return ce
    raise ValueError(f"unknown attack way '{way}'")


def _project(delta: jnp.ndarray, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """eps-ball then [0,1]-box projection (reference clamp order)."""
    delta = jnp.clip(delta, -eps, eps)
    return jnp.clip(delta, LOWER - x, UPPER - x)


def _init_delta(key, x: jnp.ndarray, eps: float, init: str = "uniform") -> jnp.ndarray:
    if init == "zero":
        return jnp.zeros_like(x)
    d = jax.random.uniform(key, x.shape, x.dtype, minval=-eps, maxval=eps)
    return jnp.clip(d, LOWER - x, UPPER - x)


def make_attack_both(apply_fn: ApplyFn, cfg: AttackConfig):
    """Joint PGD on (delta_ir, delta_vis) against the segmentation loss.

    Returns jitted fn(variables, ir, vis, label, key) -> (d_ir, d_vis).
    Reference: attack_both (attack/attack.py:417-514).
    """

    fwd = jax.checkpoint(apply_fn) if cfg.remat else apply_fn

    def loss_fn(d_ir, d_vis, variables, ir, vis, label, step):
        _, seg = fwd(variables, ir + d_ir, vis + d_vis)
        return seg_attack_loss(seg, label, cfg.way, step, cfg.iters)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1))

    @jax.jit
    def attack(variables, ir, vis, label, key):
        d_ir = d_vis = None
        for r in range(cfg.restarts):
            k_ir, k_vis, key = jax.random.split(jax.random.fold_in(key, r), 3)
            d_ir = _init_delta(k_ir, ir, cfg.epsilon, cfg.init)
            d_vis = _init_delta(k_vis, vis, cfg.epsilon, cfg.init)

            def body(i, carry):
                d_ir, d_vis = carry
                g_ir, g_vis = grad_fn(d_ir, d_vis, variables, ir, vis, label, i)
                d_ir = _project(d_ir + cfg.alpha * jnp.sign(g_ir), ir, cfg.epsilon)
                d_vis = _project(d_vis + cfg.alpha * jnp.sign(g_vis), vis, cfg.epsilon)
                return d_ir, d_vis

            d_ir, d_vis = jax.lax.fori_loop(0, cfg.iters, body, (d_ir, d_vis))
        return d_ir, d_vis

    return attack


def make_attack_single(apply_fn: ApplyFn, cfg: AttackConfig, target: str):
    """PGD on one modality ('ir' or 'vis') against the segmentation loss.

    Returns jitted fn(variables, ir, vis, label, key) -> delta.
    Reference: attack_ir / attack_vis / seg_pgd / cos_pgd.
    """
    assert target in ("ir", "vis")
    fwd = jax.checkpoint(apply_fn) if cfg.remat else apply_fn

    def loss_fn(delta, variables, ir, vis, label, step):
        if target == "ir":
            _, seg = fwd(variables, ir + delta, vis)
        else:
            _, seg = fwd(variables, ir, vis + delta)
        return seg_attack_loss(seg, label, cfg.way, step, cfg.iters)

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def attack(variables, ir, vis, label, key):
        x = ir if target == "ir" else vis
        delta = None
        for r in range(cfg.restarts):
            key = jax.random.fold_in(key, r)
            delta = _init_delta(key, x, cfg.epsilon, cfg.init)

            def body(i, d):
                g = grad_fn(d, variables, ir, vis, label, i)
                return _project(d + cfg.alpha * jnp.sign(g), x, cfg.epsilon)

            delta = jax.lax.fori_loop(0, cfg.iters, body, delta)
        return delta

    return attack


def trans_format(fused_y: jnp.ndarray, vis_rgb: jnp.ndarray) -> jnp.ndarray:
    """Recombine fused Y with the visible chroma and min-max normalize
    (attack/attack.py:75-100). Per-image min-max (batch-1 equivalent)."""
    ycrcb = rgb_to_ycrcb(vis_rgb)
    rgb = clip01(ycrcb_to_rgb(recombine_chroma(fused_y, ycrcb)))
    return minmax_normalize(rgb, per_image=True)


def make_fusion_pgd(apply_fn: ApplyFn, cfg: AttackConfig, target: str):
    """PGD against the *fusion output* (or seg loss), reference
    pgd_attack_ir / pgd_attack_vision.

    Returns jitted fn(variables, ir, vis, fusion_target, label, key) -> delta.
    fusion_target: clean fused RGB from trans_format. For target='vis' with an
    image loss, the objective is negated (reference :219).
    """
    assert target in ("ir", "vis")
    fwd = jax.checkpoint(apply_fn) if cfg.remat else apply_fn

    def loss_fn(delta, variables, ir, vis, fusion_target, label):
        if target == "ir":
            fused, seg = fwd(variables, ir + delta, vis)
        else:
            fused, seg = fwd(variables, ir, vis + delta)
        if cfg.loss == "l_seg":
            outputs = resize_bilinear(seg, label.shape[1:3], align_corners=False)
            return cross_entropy_ignore(outputs, label)
        robust = trans_format(fused, vis)
        if cfg.loss == "l_2":
            obj = jnp.mean((robust - fusion_target) ** 2)
        elif cfg.loss == "l_1":
            obj = jnp.mean(jnp.abs(robust - fusion_target))
        elif cfg.loss == "l_ssim":
            obj = ssim(robust, fusion_target)
        else:
            raise ValueError(f"unknown attack loss '{cfg.loss}'")
        return -obj if target == "vis" else obj

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def attack(variables, ir, vis, fusion_target, label, key):
        x = ir if target == "ir" else vis
        delta = None
        for r in range(cfg.restarts):
            key = jax.random.fold_in(key, r)
            delta = _init_delta(key, x, cfg.epsilon, cfg.init)

            def body(_i, d):
                g = grad_fn(d, variables, ir, vis, fusion_target, label)
                return _project(d + cfg.alpha * jnp.sign(g), x, cfg.epsilon)

            delta = jax.lax.fori_loop(0, cfg.iters, body, delta)
        return delta

    return attack


def make_fgsm_ir(apply_fn: ApplyFn, cfg: AttackConfig):
    """One-shot FGSM on the infrared input (reference fgsm_ir :247-304):
    maximize -loss(fused_rgb, zeros), step size = epsilon.

    Returns jitted fn(variables, ir, vis, key, ir_mask=None) -> delta.
    ir_mask, if given, gates the perturbation (the reference's saliency-mask
    path calls an undefined function; we accept a caller-provided mask).
    """
    fwd = jax.checkpoint(apply_fn) if cfg.remat else apply_fn

    def loss_fn(delta, variables, ir, vis):
        fused, _ = fwd(variables, ir + delta, vis)
        robust = trans_format(fused, vis)
        black = jnp.zeros_like(robust)
        if cfg.loss == "l_2":
            return -jnp.mean((robust - black) ** 2)
        if cfg.loss == "l_1":
            return -jnp.mean(jnp.abs(robust - black))
        if cfg.loss == "l_ssim":
            return -ssim(robust, black)
        if cfg.loss == "lpips":
            # reference parity (attack/attack.py:298): the lpips branch
            # compares the fused output with ITSELF — loss is identically 0,
            # grad is 0, and the "attack" degenerates to the clipped random
            # init. Kept bug-for-bug; use 'l_perceptual' for a working one.
            from paif_tpu.ops.perceptual import perceptual_distance

            return jnp.mean(perceptual_distance(2 * robust - 1, 2 * robust - 1))
        if cfg.loss == "l_perceptual":
            # working self-contained replacement for the reference's learned
            # LPIPS: maximize perceptual distance from the black image
            from paif_tpu.ops.perceptual import perceptual_distance

            return -jnp.mean(perceptual_distance(robust, black))
        raise ValueError(f"unknown attack loss '{cfg.loss}'")

    grad_fn = jax.grad(loss_fn)

    @partial(jax.jit, static_argnames=())
    def attack(variables, ir, vis, key, ir_mask: Optional[jnp.ndarray] = None):
        delta = _init_delta(key, ir, cfg.epsilon, cfg.init)
        if ir_mask is not None:
            delta = jnp.clip(delta * ir_mask, LOWER - ir, UPPER - ir)
        g = grad_fn(delta, variables, ir, vis)
        delta = jnp.clip(delta + cfg.epsilon * jnp.sign(g), LOWER - ir, UPPER - ir)
        if ir_mask is not None:
            delta = delta * ir_mask
        return delta

    return attack
