"""Self-contained LPIPS-style perceptual distance.

The reference's fgsm_ir offers an `lpips` attack loss built on the external
`lpips` package's learned AlexNet weights (attack/attack.py:267-268) — an
unshippable dependency, and the branch is dead anyway (its loss compares an
image with ITSELF, :298, upstream comments it "# useless"). This module is
the self-contained replacement for callers that want a WORKING perceptual
objective: the LPIPS computation graph (deep conv features, per-channel unit
normalization, mean squared feature difference across layers) over FIXED
random convolutional features instead of learned ones. Random-feature
perceptual metrics are a known-reasonable proxy (random VGG features
correlate with human judgments nearly as well as trained ones); what matters
here is a stable, jittable, weight-free distance the attack can descend.

TPU notes: three stride-2 conv stages keep the work a few percent of a
fusion forward; weights are ~23k f32 constants folded into the program.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CHANNELS: Tuple[int, ...] = (16, 32, 64)
_SEED = 42


@lru_cache(maxsize=4)
def _feature_weights(c_in: int) -> Tuple[np.ndarray, ...]:
    """Fixed He-initialized 3x3 conv kernels (HWIO), deterministic."""
    rng = np.random.default_rng(_SEED)
    ws = []
    for c_out in _CHANNELS:
        fan_in = 9 * c_in
        ws.append(
            rng.normal(0.0, np.sqrt(2.0 / fan_in), (3, 3, c_in, c_out)).astype(
                np.float32
            )
        )
        c_in = c_out
    return tuple(ws)


def _features(x: jnp.ndarray) -> list:
    feats = []
    for w in _feature_weights(x.shape[-1]):
        x = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w, x.dtype),
            window_strides=(2, 2),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def perceptual_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LPIPS-style distance, (B,H,W,C) pair -> per-image (B,) distances.

    Unit-normalizes each feature map over channels (the LPIPS 'unit ball'
    trick that makes distances scale-free), then averages squared feature
    differences spatially and across the three stages.
    """
    eps = jnp.asarray(1e-8, x.dtype)
    total = None
    for fx, fy in zip(_features(x), _features(y)):
        nx = fx * jax.lax.rsqrt(jnp.sum(fx * fx, -1, keepdims=True) + eps)
        ny = fy * jax.lax.rsqrt(jnp.sum(fy * fy, -1, keepdims=True) + eps)
        d = jnp.mean(jnp.square(nx - ny), axis=(1, 2, 3))
        total = d if total is None else total + d
    return total / len(_CHANNELS)
