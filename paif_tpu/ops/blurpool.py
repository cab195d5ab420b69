"""Anti-aliased blur-pool downsampling (Zhang 2019), NHWC.

Reference behavior: the `antialias.Downsample` blur-pool used by
operations_m.py ResidualDownSample (:206-224): a normalized binomial filter
(e.g. [1,2,1] for filt_size 3) applied depthwise with reflect padding and
stride 2.
"""

from __future__ import annotations

from math import comb

import jax
import jax.numpy as jnp


def _binomial(n: int) -> jnp.ndarray:
    k = jnp.asarray([comb(n - 1, i) for i in range(n)], dtype=jnp.float32)
    return k


def blur_pool(x: jnp.ndarray, filt_size: int = 3, stride: int = 2) -> jnp.ndarray:
    """Blur + subsample (B,H,W,C) -> (B,ceil(H/stride),ceil(W/stride),C)."""
    k1 = _binomial(filt_size)
    k2 = jnp.outer(k1, k1)
    k2 = k2 / jnp.sum(k2)
    c = x.shape[-1]
    kern = jnp.tile(k2.astype(x.dtype)[:, :, None, None], (1, 1, 1, c))
    pad_lo = (filt_size - 1) // 2
    pad_hi = filt_size - 1 - pad_lo
    x = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
