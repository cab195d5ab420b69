"""GAN machinery: loss parity vs reference, discriminator shape, training step."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import optax

from tests.reference_stubs import install_reference_stubs

install_reference_stubs()

from paif_tpu.genotype import PAIF_GENOTYPE  # noqa: E402
from paif_tpu.losses.fusion import fusion_loss_grad2  # noqa: E402
from paif_tpu.models import FusionNetSearched  # noqa: E402
from paif_tpu.train.gan import PixelDiscriminator, gan_loss, gradient_penalty, make_gan_fusion_step  # noqa: E402


def test_gan_loss_matches_reference(rng):
    from core.model_fusion_auto import GANLoss

    pred = rng.normal(0, 1, (2, 4, 4, 1)).astype(np.float32)
    t = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    for mode in ("lsgan", "vanilla", "wgangp"):
        ref = GANLoss(mode)
        for is_real in (True, False):
            want = float(ref(t, is_real))
            got = float(gan_loss(jnp.asarray(pred), is_real, mode))
            assert abs(got - want) < 1e-5, (mode, is_real, got, want)


def test_discriminator_and_gp(rng):
    disc = PixelDiscriminator(ndf=8)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)), jnp.float32)
    dv = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(dv, x)
    assert out.shape == (2, 16, 16, 1)
    gp, grads = gradient_penalty(
        lambda v, a: disc.apply(v, a), dv, x, x * 0.5, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(gp)) and grads.shape == x.shape


def test_gan_fusion_step_runs(rng):
    fusion = FusionNetSearched(8, PAIF_GENOTYPE)
    disc = PixelDiscriminator(ndf=8)
    ir = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 3)), jnp.float32)
    mask = jnp.maximum(ir, vis[..., 0:1])
    g_vars = fusion.init(jax.random.PRNGKey(0), ir, vis)
    gv = g_vars["params"]
    g_extra = {k: v for k, v in g_vars.items() if k != "params"}
    d_vars = disc.init(jax.random.PRNGKey(1), mask)
    dv = d_vars["params"]
    d_extra = {k: v for k, v in d_vars.items() if k != "params"}
    g_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
    step = make_gan_fusion_step(fusion, disc, g_tx, d_tx, fusion_loss_grad2)
    g_opt, d_opt = g_tx.init(gv), d_tx.init(dv)
    metrics = None
    for i in range(3):
        gv, g_opt, dv, d_opt, metrics = step(gv, g_extra, g_opt, dv, d_extra, d_opt, ir, vis, mask, jax.random.PRNGKey(i))
    assert all(np.isfinite(float(v)) for v in metrics.values())
