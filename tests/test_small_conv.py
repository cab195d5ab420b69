"""Pallas small-channel conv kernel: forward + grad parity vs lax.conv
(interpret mode on CPU; the same code compiles on TPU)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from paif_tpu.ops.pallas.small_conv import conv2d_same_small


def _ref(x, w, d):
    k = w.shape[0]
    pad = d * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


@pytest.mark.parametrize("k,d", [(3, 1), (3, 2), (5, 1), (7, 1)])
def test_small_conv_forward(rng, k, d):
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 20, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (k, k, 32, 32)), jnp.float32)
    got = conv2d_same_small(x, w, d)
    want = _ref(x, w, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_small_conv_odd_height(rng):
    # H not divisible by the preferred tile -> smaller tile fallback
    x = jnp.asarray(rng.normal(0, 1, (1, 7, 12, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv2d_same_small(x, w, 1)), np.asarray(_ref(x, w, 1)), atol=2e-5, rtol=1e-4
    )


def test_small_conv_grads(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 10, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 8)), jnp.float32)
    t = jnp.asarray(rng.normal(0, 1, (1, 8, 10, 8)), jnp.float32)

    def loss_p(x, w):
        return jnp.sum((conv2d_same_small(x, w, 1) - t) ** 2)

    def loss_r(x, w):
        return jnp.sum((_ref(x, w, 1) - t) ** 2)

    gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-4, rtol=1e-3)


def test_conv_factory_param_tree_unchanged(rng):
    """SmallConv2d must keep nn.Conv's param names/shapes (importer contract)
    and match the lax path numerically when the kernel is disabled."""
    os.environ["PAIF_PALLAS_CONV"] = "0"
    try:
        from paif_tpu.nn.layers import Conv

        m = Conv(8, 3, dilation=2, use_bias=True)
        x = jnp.asarray(rng.normal(0, 1, (1, 10, 12, 4)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        assert v["params"]["kernel"].shape == (3, 3, 4, 8)
        assert v["params"]["bias"].shape == (8,)
        y0 = m.apply(v, x)
        os.environ["PAIF_PALLAS_CONV"] = "1"
        y1 = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5, rtol=1e-4)
    finally:
        os.environ.pop("PAIF_PALLAS_CONV", None)
