"""Per-pixel classification losses with torch-compatible semantics.

torch.nn.CrossEntropyLoss(ignore_index=255) with reduction='mean' averages
over the *non-ignored* pixels only (attack/attack.py:103-114,
core/loss.py:375-383). Logits here are NHWC (B,H,W,C); labels (B,H,W) int.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy_per_pixel(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel CE, no masking. labels clipped into range for safe gather."""
    num_classes = logits.shape[-1]
    safe = jnp.clip(labels, 0, num_classes - 1)
    logz = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logz, safe[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -ll


def cross_entropy_ignore(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Mean CE over pixels whose label != ignore_index. Returns a scalar."""
    per_pix = softmax_cross_entropy_per_pixel(logits, labels)
    valid = (labels != ignore_index).astype(per_pix.dtype)
    total = jnp.sum(per_pix * valid)
    count = jnp.maximum(jnp.sum(valid), 1.0)
    return total / count
