"""FCOS-style detection losses (core/loss.py:18-339), jit-friendly NHWC.

Supports the paper's detection experiment surface: multi-level target
generation (in-box + scale-range + center-sampling assignment to the
smallest-area gt), focal classification loss, centerness BCE, and IoU/GIoU
regression. Where the reference uses boolean indexing over positives
(dynamic shapes), this uses masked reductions — identical values, one static
XLA program.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

INF_AREA = 99999999.0


def level_coords(h: int, w: int, stride: int) -> jnp.ndarray:
    """Feature-map cell centers in original-image coords: (h*w, 2) [x, y]."""
    xs = (jnp.arange(w, dtype=jnp.float32) * stride) + stride // 2
    ys = (jnp.arange(h, dtype=jnp.float32) * stride) + stride // 2
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def gen_level_targets(
    hw: Tuple[int, int],
    gt_boxes: jnp.ndarray,  # (B, M, 4) xyxy; padded rows may be zeros
    classes: jnp.ndarray,  # (B, M) int
    stride: int,
    limit_range: Tuple[float, float],
    sample_radiu_ratio: float = 1.5,
):
    """cls (B,N,1) int, cnt (B,N,1), reg (B,N,4); negatives get 0 / -1 / -1."""
    coords = level_coords(hw[0], hw[1], stride)  # (N, 2)
    x = coords[:, 0][None, :, None]  # (1, N, 1)
    y = coords[:, 1][None, :, None]
    l_off = x - gt_boxes[..., 0][:, None, :]
    t_off = y - gt_boxes[..., 1][:, None, :]
    r_off = gt_boxes[..., 2][:, None, :] - x
    b_off = gt_boxes[..., 3][:, None, :] - y
    ltrb = jnp.stack([l_off, t_off, r_off, b_off], axis=-1)  # (B, N, M, 4)

    areas = (ltrb[..., 0] + ltrb[..., 2]) * (ltrb[..., 1] + ltrb[..., 3])
    off_min = jnp.min(ltrb, axis=-1)
    off_max = jnp.max(ltrb, axis=-1)
    mask_in_box = off_min > 0
    mask_in_level = (off_max > limit_range[0]) & (off_max <= limit_range[1])

    radius = stride * sample_radiu_ratio
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2
    c_off = jnp.stack(
        [x - cx[:, None, :], y - cy[:, None, :], cx[:, None, :] - x, cy[:, None, :] - y],
        axis=-1,
    )
    mask_center = jnp.max(c_off, axis=-1) < radius

    mask_pos = mask_in_box & mask_in_level & mask_center  # (B, N, M)
    areas = jnp.where(mask_pos, areas, INF_AREA)
    best = jnp.argmin(areas, axis=-1)  # (B, N)

    reg = jnp.take_along_axis(ltrb, best[..., None, None].repeat(4, -1), axis=2)[:, :, 0, :]
    cls = jnp.take_along_axis(
        jnp.broadcast_to(classes[:, None, :], areas.shape), best[..., None], axis=2
    )[..., 0]

    lr_min = jnp.minimum(reg[..., 0], reg[..., 2])
    lr_max = jnp.maximum(reg[..., 0], reg[..., 2])
    tb_min = jnp.minimum(reg[..., 1], reg[..., 3])
    tb_max = jnp.maximum(reg[..., 1], reg[..., 3])
    cnt = jnp.sqrt(jnp.maximum(lr_min * tb_min, 0.0) / (lr_max * tb_max + 1e-10))

    any_pos = jnp.any(mask_pos, axis=-1)  # (B, N)
    cls = jnp.where(any_pos, cls, 0)[..., None]
    cnt = jnp.where(any_pos, cnt, -1.0)[..., None]
    reg = jnp.where(any_pos[..., None], reg, -1.0)
    return cls, cnt, reg


def gen_targets(
    level_hws: Sequence[Tuple[int, int]],
    gt_boxes: jnp.ndarray,
    classes: jnp.ndarray,
    strides: Sequence[int],
    limit_ranges: Sequence[Tuple[float, float]],
):
    """Concatenated targets over the level pyramid (GenTargets.forward)."""
    outs = [
        gen_level_targets(hw, gt_boxes, classes, s, lr)
        for hw, s, lr in zip(level_hws, strides, limit_ranges)
    ]
    cls = jnp.concatenate([o[0] for o in outs], axis=1)
    cnt = jnp.concatenate([o[1] for o in outs], axis=1)
    reg = jnp.concatenate([o[2] for o in outs], axis=1)
    return cls, cnt, reg


def _flatten_levels(preds: List[jnp.ndarray]) -> jnp.ndarray:
    """list of (B, h, w, C) -> (B, sum(h*w), C)."""
    return jnp.concatenate([p.reshape(p.shape[0], -1, p.shape[-1]) for p in preds], axis=1)


def focal_loss_from_logits(preds, targets, gamma=2.0, alpha=0.25):
    """Per-element focal BCE summed (core/loss.py:300-310)."""
    p = jax.nn.sigmoid(preds)
    pt = p * targets + (1.0 - p) * (1.0 - targets)
    w = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return jnp.sum(-w * ((1.0 - pt) ** gamma) * jnp.log(jnp.maximum(pt, 1e-12)))


def compute_cls_loss(preds: List[jnp.ndarray], targets: jnp.ndarray, mask: jnp.ndarray):
    """(B,) focal loss normalized by positives (core/loss.py:168-194).
    NB: the reference sums over ALL locations (mask only sets num_pos)."""
    flat = _flatten_levels(preds)  # (B, N, C)
    num_classes = flat.shape[-1]
    onehot = (
        jnp.arange(1, num_classes + 1)[None, None, :] == targets
    ).astype(flat.dtype)  # (B, N, C)
    num_pos = jnp.maximum(jnp.sum(mask.astype(flat.dtype), axis=1), 1.0)
    per_batch = jax.vmap(focal_loss_from_logits)(flat, onehot)
    return per_batch / num_pos


def compute_cnt_loss(preds: List[jnp.ndarray], targets: jnp.ndarray, mask: jnp.ndarray):
    """(B,) centerness BCE over positives (core/loss.py:197-223)."""
    flat = _flatten_levels(preds)[..., 0]  # (B, N)
    t = targets[..., 0]
    m = mask.astype(flat.dtype)
    bce = jnp.maximum(flat, 0) - flat * t + jnp.log1p(jnp.exp(-jnp.abs(flat)))
    num_pos = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.sum(bce * m, axis=1) / num_pos


def _iou_terms(preds, targets):
    lt = jnp.minimum(preds[..., :2], targets[..., :2])
    rb = jnp.minimum(preds[..., 2:], targets[..., 2:])
    wh = jnp.maximum(rb + lt, 0.0)
    overlap = wh[..., 0] * wh[..., 1]
    area1 = (preds[..., 2] + preds[..., 0]) * (preds[..., 3] + preds[..., 1])
    area2 = (targets[..., 2] + targets[..., 0]) * (targets[..., 3] + targets[..., 1])
    union = area1 + area2 - overlap
    return overlap, union


def iou_loss_elems(preds, targets):
    overlap, union = _iou_terms(preds, targets)
    iou = overlap / union
    return -jnp.log(jnp.maximum(iou, 1e-6))


def giou_loss_elems(preds, targets):
    overlap, union = _iou_terms(preds, targets)
    iou = overlap / union
    lt_max = jnp.maximum(preds[..., :2], targets[..., :2])
    rb_max = jnp.maximum(preds[..., 2:], targets[..., 2:])
    wh_max = jnp.maximum(rb_max + lt_max, 0.0)
    g_area = wh_max[..., 0] * wh_max[..., 1]
    giou = iou - (g_area - union) / jnp.maximum(g_area, 1e-10)
    return 1.0 - giou


def compute_reg_loss(preds: List[jnp.ndarray], targets: jnp.ndarray, mask: jnp.ndarray, mode="giou"):
    """(B,) IoU/GIoU loss over positives (core/loss.py:226-255)."""
    flat = _flatten_levels(preds)  # (B, N, 4)
    elems = giou_loss_elems(flat, targets) if mode == "giou" else iou_loss_elems(flat, targets)
    m = mask.astype(flat.dtype)
    num_pos = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.sum(jnp.where(mask, elems, 0.0), axis=1) / num_pos


def fcos_loss(preds, targets, add_centerness: bool = True, reg_mode: str = "giou"):
    """(cls, cnt, reg, total) scalars (core/loss.py:313-339)."""
    cls_logits, cnt_logits, reg_preds = preds
    cls_t, cnt_t, reg_t = targets
    mask_pos = (cnt_t > -1)[..., 0]
    cls = jnp.mean(compute_cls_loss(cls_logits, cls_t, mask_pos))
    cnt = jnp.mean(compute_cnt_loss(cnt_logits, cnt_t, mask_pos))
    reg = jnp.mean(compute_reg_loss(reg_preds, reg_t, mask_pos, reg_mode))
    total = cls + reg + (cnt if add_centerness else cnt * 0.0)
    return cls, cnt, reg, total
