"""Color-space transforms and normalization, NHWC.

Reference semantics: /root/reference/core/model_fusion_auto.py:69-111
(RGB2YCrCb / YCrCb2RGB) and Network_MM_Searched.forward normalization chain
(model_fusion_auto.py:1043-1060). The reference's YCrCb is BT.601-flavoured
with Cr/Cb offsets of +0.5 and scale factors 0.713 / 0.564.
"""

from __future__ import annotations

import jax.numpy as jnp

# ImageNet statistics on a 0..255 scale, as used by the reference
# (model_fusion_auto.py:1041-1042).
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def rgb_to_ycrcb(x: jnp.ndarray) -> jnp.ndarray:
    """RGB (B,H,W,3) in [0,1] -> YCrCb (B,H,W,3).

    Y  = .299 R + .587 G + .114 B
    Cr = (R - Y) * .713 + .5
    Cb = (B - Y) * .564 + .5
    """
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 0.5
    cb = (b - y) * 0.564 + 0.5
    return jnp.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_ycrcb`.

    Matches the reference's matrix form: (ycrcb + [0,-.5,-.5]) @ M with
    M = [[1,1,1],[1.403,-.714,0],[0,-.344,1.773]].
    """
    y = x[..., 0]
    cr = x[..., 1] - 0.5
    cb = x[..., 2] - 0.5
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-1)


def recombine_chroma(fused_y: jnp.ndarray, vis_ycrcb: jnp.ndarray) -> jnp.ndarray:
    """Concatenate the fused luminance with the visible image's Cr/Cb.

    fused_y: (B,H,W,1); vis_ycrcb: (B,H,W,3). Returns YCrCb (B,H,W,3).
    Reference: model_fusion_auto.py:1046.
    """
    return jnp.concatenate([fused_y, vis_ycrcb[..., 1:3]], axis=-1)


def clip01(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to the [0,1] box (reference's double torch.where)."""
    return jnp.clip(x, 0.0, 1.0)


def minmax_normalize(x: jnp.ndarray, per_image: bool = True) -> jnp.ndarray:
    """(x - min) / (max - min).

    The reference normalizes over the *whole batch tensor*
    (model_fusion_auto.py:1052-1054) — correct only at batch 1. We default to
    per-image reduction so batched inference reproduces the reference's
    batch-1 numbers exactly.
    """
    if per_image:
        axes = tuple(range(1, x.ndim))
        lo = jnp.min(x, axis=axes, keepdims=True)
        hi = jnp.max(x, axis=axes, keepdims=True)
    else:
        lo = jnp.min(x)
        hi = jnp.max(x)
    return (x - lo) / (hi - lo)


def imagenet_normalize(x01: jnp.ndarray) -> jnp.ndarray:
    """Scale [0,1] RGB to 255 and apply per-channel ImageNet normalization.

    Reference: model_fusion_auto.py:1056-1058.
    """
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x01.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x01.dtype)
    return (x01 * 255.0 - mean) / std
