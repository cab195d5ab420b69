"""Differentiable SSIM with a gaussian window, NHWC.

Reference semantics: pytorch_ssim/__init__.py — 11x11 gaussian window
(sigma 1.5, normalized), depthwise convs with zero padding window//2,
C1=0.01^2, C2=0.03^2, biased (uncorrected) moment estimates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Normalized 2D gaussian window (window_size, window_size)."""
    xs = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(xs**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _window_filter(x: jnp.ndarray, win2d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise filter NHWC input with the 2D window, zero padding."""
    c = x.shape[-1]
    k = win2d.astype(x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    pad = win2d.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM between two NHWC images. Returns a scalar (size_average) or (B,)."""
    win = gaussian_window(window_size)
    mu1 = _window_filter(img1, win)
    mu2 = _window_filter(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _window_filter(img1 * img1, win) - mu1_sq
    sigma2_sq = _window_filter(img2 * img2, win) - mu2_sq
    sigma12 = _window_filter(img1 * img2, win) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


__all__ = ["ssim", "gaussian_window"]
