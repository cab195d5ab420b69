"""Pallas kernel tests (interpret mode on CPU): fused SR-attention vs the
einsum reference, forward and gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from paif_tpu.ops.pallas.sr_attention import sr_attention

BH, N, M, D = 2, 140, 20, 32  # deliberately unaligned sizes
SCALE = D**-0.5


def _ref_attn(q, k, v):
    s = jnp.einsum("bnd,bmd->bnm", q, k) * SCALE
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v)


def test_sr_attention_forward(rng):
    q = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (BH, M, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (BH, M, D)), jnp.float32)
    got = sr_attention(q, k, v, SCALE)
    want = _ref_attn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_sr_attention_grads(rng):
    q = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (BH, M, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (BH, M, D)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(sr_attention(q, k, v, SCALE) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attn(q, k, v) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
