"""Sobel gradient magnitude |Gx| + |Gy|, NHWC, zero padding.

Reference semantics: core/loss.py:634-650 (fixed 3x3 kernels applied with
F.conv2d padding=1 to a single-channel map).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) so importing this module never initializes a JAX backend
_KX = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], np.float32)
_KY = np.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], np.float32)


def _depthwise3x3(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Apply one 3x3 kernel depthwise to NHWC input with zero padding."""
    c = x.shape[-1]
    kern = jnp.tile(jnp.asarray(k, x.dtype)[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 per group
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def sobel_xy(x: jnp.ndarray) -> jnp.ndarray:
    """|sobel_x(x)| + |sobel_y(x)| for NHWC input (any channel count, depthwise)."""
    gx = _depthwise3x3(x, _KX)
    gy = _depthwise3x3(x, _KY)
    return jnp.abs(gx) + jnp.abs(gy)
