"""Patch-wise soft-histogram (KDE) entropy, NHWC.

Reference semantics: core/Entropy.py — unfold into non-overlapping
psize x psize patches, estimate a 32-bin gaussian-KDE pdf per patch
(sigma 0.01, bins linspace(0,1,32)), and sum -sum(p log p) over all patches
and batch entries.
"""

from __future__ import annotations

import jax.numpy as jnp


def patch_entropy(
    x: jnp.ndarray,
    patch_size: int = 4,
    num_bins: int = 32,
    sigma: float = 0.01,
) -> jnp.ndarray:
    """Total soft-histogram entropy of (B,H,W,1) input. Returns a scalar.

    H and W must be divisible by patch_size (the reference's unfold silently
    drops remainders; PAIF inputs are 480x640 with psize 4, so exact).
    """
    b, h, w, c = x.shape
    if c != 1:
        raise ValueError("patch_entropy expects a single-channel map")
    ph, pw = h // patch_size, w // patch_size
    # (B, ph, psize, pw, psize) -> (B*ph*pw, psize*psize)
    patches = x[:, : ph * patch_size, : pw * patch_size, 0]
    patches = patches.reshape(b, ph, patch_size, pw, patch_size)
    patches = patches.transpose(0, 1, 3, 2, 4).reshape(b * ph * pw, patch_size * patch_size)

    bins = jnp.linspace(0.0, 1.0, num_bins).astype(x.dtype)
    resid = patches[:, :, None] - bins[None, None, :]
    kernel = jnp.exp(-0.5 * (resid / sigma) ** 2)
    pdf = jnp.mean(kernel, axis=1)  # (P, bins)
    # The reference uses 1e-40, which is subnormal in float32 and flushed to
    # zero on TPU (log(0) -> -inf -> NaN). 1e-30 is the smallest comfortable
    # normal float32; the difference it makes to -p*log(p) is ~1e-28.
    eps = 1e-30
    pdf = pdf / (jnp.sum(pdf, axis=1, keepdims=True) + eps) + eps
    ent = -jnp.sum(pdf * jnp.log(pdf), axis=1)
    return jnp.sum(ent)
