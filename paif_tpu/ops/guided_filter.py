"""Guided filter via cumulative-sum box filters, NHWC.

Reference behavior: guided_filter_pytorch.GuidedFilter(r, eps) as used in
Cell_Decom.decomposition (core/model_fusion_auto.py:522-535) with a
single-channel guide (the per-pixel channel max-min "residue") filtering a
C-channel feature map. That library implements He et al.'s fast guided
filter: box sums computed from integral images with clamped (shrinking)
windows at the borders, normalized by the true per-pixel window size N.

Cumsum-based box filtering is O(HW) independent of radius and maps to two
XLA scans + cheap slicing — no Pallas needed; XLA fuses the elementwise
algebra around it.
"""

from __future__ import annotations

import jax.numpy as jnp


def _box_1d(cum: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Box sum along `axis` from an inclusive cumsum, window [i-r, i+r] clamped."""
    n = cum.shape[axis]

    def take(lo, hi):
        return jnp.take(cum, jnp.arange(lo, hi), axis=axis)

    # rows 0..r-1: sum_{0..i+r} = cum[i+r]
    left = take(r, 2 * r + 1)
    # rows r..n-r-1: cum[i+r] - cum[i-r-1]
    middle = take(2 * r + 1, n) - take(0, n - 2 * r - 1)
    # rows n-r..n-1: cum[n-1] - cum[i-r-1]
    last = jnp.take(cum, jnp.array([n - 1]), axis=axis)
    right = last - take(n - 2 * r - 1, n - r - 1)
    return jnp.concatenate([left, middle, right], axis=axis)


def box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sum over a (2r+1)x(2r+1) window clamped at image borders.

    x: (B,H,W,C). Returns same shape (window *sums*, not means).
    """
    if x.shape[1] <= 2 * r or x.shape[2] <= 2 * r:
        raise ValueError(f"box_filter radius {r} too large for spatial dims {x.shape[1:3]}")
    out = _box_1d(jnp.cumsum(x, axis=1), r, axis=1)
    out = _box_1d(jnp.cumsum(out, axis=2), r, axis=2)
    return out


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, r: int, eps: float) -> jnp.ndarray:
    """Guided filter of `src` using `guide`.

    guide: (B,H,W,1) or (B,H,W,C); src: (B,H,W,C). Returns (B,H,W,C).
    A 1-channel guide broadcasts across src channels (the reference's usage).
    """
    b, h, w, _ = guide.shape
    n = box_filter(jnp.ones((1, h, w, 1), dtype=src.dtype), r)  # true window sizes
    mean_g = box_filter(guide, r) / n
    mean_s = box_filter(src, r) / n
    cov_gs = box_filter(guide * src, r) / n - mean_g * mean_s
    var_g = box_filter(guide * guide, r) / n - mean_g * mean_g
    a = cov_gs / (var_g + eps)
    b_ = mean_s - a * mean_g
    mean_a = box_filter(a, r) / n
    mean_b = box_filter(b_, r) / n
    return mean_a * guide + mean_b
