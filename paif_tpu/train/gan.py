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


def make_gan_fusion_step(
    fusion_model,
    disc_model,
    fusion_tx,
    disc_tx,
    fusion_loss_fn,
    gan_mode: str = "lsgan",
    adv_weight: float = 0.1,
    gp_weight: float = 0.0,  # >0 enables WGAN-GP
):
    """GAN fusion pretraining step (the reference's training-time adversarial
    loss, model_fusion_auto.py:267-391): the discriminator judges fused
    luminance against the mask target; the generator gets fusion_loss +
    adv_weight * GAN loss. Returns a jitted
    fn(g_params, g_opt, d_params, d_opt, ir, vis, mask, key) ->
    (g_params, g_opt, d_params, d_opt, metrics)."""
    import optax

    def g_loss_fn(g_params, g_extra, d_params, d_extra, ir, vis, mask):
        fused = fusion_model.apply(dict(g_extra, params=g_params), ir, vis)
        rec = fusion_loss_fn(ir, vis, fused, mask)
        pred_fake = disc_model.apply(dict(d_extra, params=d_params), fused)
        adv = gan_loss(pred_fake, True, gan_mode)
        return rec + adv_weight * adv, (rec, adv, fused)

    def d_loss_fn(d_params, d_extra, fused, real, key):
        pred_real = disc_model.apply(dict(d_extra, params=d_params), real)
        pred_fake = disc_model.apply(dict(d_extra, params=d_params), fused)
        loss = gan_loss(pred_real, True, gan_mode) + gan_loss(pred_fake, False, gan_mode)
        if gp_weight > 0.0:
            gp, _ = gradient_penalty(
                lambda v, x: disc_model.apply(v, x),
                dict(d_extra, params=d_params),
                real,
                fused,
                key,
                lambda_gp=gp_weight,
            )
            loss = loss + gp
        return loss

    @jax.jit
    def step(g_params, g_extra, g_opt, d_params, d_extra, d_opt, ir, vis, mask, key):
        """*_extra: non-trained collections (batch_stats) of each model."""
        (g_total, (rec, adv, fused)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_params, g_extra, d_params, d_extra, ir, vis, mask
        )
        g_updates, g_opt = fusion_tx.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        real = mask[..., 0:1]
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            d_params, d_extra, jax.lax.stop_gradient(fused), real, key
        )
        d_updates, d_opt = disc_tx.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        metrics = {"g_total": g_total, "recon": rec, "adv": adv, "d_loss": d_loss}
        return g_params, g_opt, d_params, d_opt, metrics

    return step


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
