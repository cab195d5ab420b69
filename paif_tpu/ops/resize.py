"""Bilinear resize with exact torch F.interpolate semantics, NHWC.

The reference upsamples seg logits and decoder features with
F.interpolate(mode='bilinear', align_corners=False) (e.g. attack/attack.py:446,
core/segformer_head.py:67-73). PyTorch's convention (align_corners=False):
src = (dst + 0.5) * in/out - 0.5, clamped below at 0; x1 = min(x0+1, in-1);
no antialiasing even when downscaling — which differs from jax.image.resize,
so we implement it directly.

TPU-first design: the resize is expressed as two dense matrix products
(separable row/column interpolation matrices built host-side per static
shape), which XLA places on the MXU — far faster than gather-based sampling
and trivially differentiable.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-interpolation matrix, float32."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
    x0 = np.floor(src).astype(np.int64)
    x0 = np.minimum(x0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    w1 = (src - x0).astype(np.float32)
    w0 = 1.0 - w1
    m[dst.astype(np.int64), x0] += w0
    m[dst.astype(np.int64), x1] += w1
    return m


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize (B,H,W,C) to (B,out_h,out_w,C), torch-bilinear semantics."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    dtype = x.dtype
    from paif_tpu.nn.layers import get_precision
    hi = get_precision()
    if oh != h:
        mh = jnp.asarray(_interp_matrix(h, oh, align_corners), dtype=dtype)
        x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=hi)
    if ow != w:
        mw = jnp.asarray(_interp_matrix(w, ow, align_corners), dtype=dtype)
        x = jnp.einsum("pw,bhwc->bhpc", mw, x, precision=hi)
    return x
