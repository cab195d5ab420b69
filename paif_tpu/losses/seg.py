"""Segmentation losses (core/loss.py:342-383), NHWC logits.

OhemCELoss under jit: the data-dependent 'keep hard pixels' selection is
expressed with a sorted-loss threshold + masked mean (lax.cond), avoiding
dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from paif_tpu.ops.losses import softmax_cross_entropy_per_pixel


def _per_pixel_valid(logits, labels, ignore_index):
    per_pix = softmax_cross_entropy_per_pixel(logits, labels)
    valid = (labels != ignore_index).astype(per_pix.dtype)
    return per_pix * valid, valid


def ohem_ce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    thresh: float = 0.7,
    n_min: int = 1,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Online hard example mining CE (core/loss.py:342-358).

    thresh is a probability; pixels with loss > -log(thresh) are kept when
    there are at least n_min of them, else the top n_min hardest are averaged.
    """
    per_pix, _ = _per_pixel_valid(logits, labels, ignore_index)
    flat = per_pix.reshape(-1)
    t = -jnp.log(jnp.asarray(thresh, dtype=flat.dtype))
    sorted_desc = -jnp.sort(-flat)

    def above_thresh(_):
        mask = (flat > t).astype(flat.dtype)
        return jnp.sum(flat * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def top_nmin(_):
        return jnp.mean(jax.lax.dynamic_slice_in_dim(sorted_desc, 0, n_min))

    return jax.lax.cond(sorted_desc[n_min - 1] > t, above_thresh, top_nmin, None)


def softmax_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """SoftmaxFocalLoss (core/loss.py:361-373): NLL of (1-p)^gamma * log p."""
    num_classes = logits.shape[-1]
    scores = jax.nn.softmax(logits, axis=-1)
    log_score = jax.nn.log_softmax(logits, axis=-1)
    weighted = ((1.0 - scores) ** gamma) * log_score
    safe = jnp.clip(labels, 0, num_classes - 1)
    picked = jnp.take_along_axis(weighted, safe[..., None].astype(jnp.int32), axis=-1)[..., 0]
    valid = (labels != ignore_index).astype(picked.dtype)
    return -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def normal_loss(logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255) -> jnp.ndarray:
    """NormalLoss (core/loss.py:375-383). Reference quirk: it computes CE
    with reduction='none' (ignored pixels -> 0) then means over ALL pixels,
    so the divisor is the total count, not the valid count."""
    per_pix, _valid = _per_pixel_valid(logits, labels, ignore_index)
    return jnp.mean(per_pix)
