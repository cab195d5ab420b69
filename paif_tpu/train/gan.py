"""GAN machinery for fusion pretraining (model_fusion_auto.py:267-391):
1x1 PixelDiscriminator, lsgan/vanilla/wgangp objectives, WGAN-GP gradient
penalty — as pure functions + a flax discriminator.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import get_precision, BatchNorm


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN: C -> ndf -> 2ndf -> 1 with LeakyReLU(0.2) and BN."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def lrelu(v):
            return jnp.where(v >= 0, v, 0.2 * v)

        x = lrelu(nn.Conv(self.ndf, (1, 1), use_bias=True, precision=get_precision(), name="c0")(x))
        x = nn.Conv(self.ndf * 2, (1, 1), use_bias=False, precision=get_precision(), name="c1")(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = lrelu(x)
        return nn.Conv(1, (1, 1), use_bias=False, precision=get_precision(), name="c2")(x)


def gan_loss(prediction: jnp.ndarray, target_is_real: bool, mode: str = "lsgan") -> jnp.ndarray:
    """GANLoss.__call__ semantics (model_fusion_auto.py:340-356)."""
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((prediction - target) ** 2)
    if mode == "vanilla":
        target = 1.0 if target_is_real else 0.0
        # BCE-with-logits
        return jnp.mean(
            jnp.maximum(prediction, 0) - prediction * target + jnp.log1p(jnp.exp(-jnp.abs(prediction)))
        )
    if mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
    raise ValueError(f"gan mode {mode} not implemented")


def gradient_penalty(
    disc_apply,
    variables,
    real: jnp.ndarray,
    fake: jnp.ndarray,
    key: jax.Array,
    kind: str = "mixed",
    constant: float = 1.0,
    lambda_gp: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """WGAN-GP penalty (model_fusion_auto.py:359-391). Returns (penalty, grads)."""
    if lambda_gp <= 0.0:
        return jnp.zeros(()), None
    if kind == "real":
        interp = real
    elif kind == "fake":
        interp = fake
    elif kind == "mixed":
        alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1), real.dtype)
        interp = alpha * real + (1.0 - alpha) * fake
    else:
        raise NotImplementedError(kind)

    def disc_sum(x):
        return jnp.sum(disc_apply(variables, x))

    grads = jax.grad(disc_sum)(interp)
    flat = grads.reshape(real.shape[0], -1)
    norms = jnp.linalg.norm(flat + 1e-16, axis=1)
    return jnp.mean((norms - constant) ** 2) * lambda_gp, grads
