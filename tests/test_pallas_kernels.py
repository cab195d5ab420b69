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


def test_zconv_forward_and_grads(rng):
    """Implicit-GEMM z-conv (interpret mode) vs the plain NHWC conv: forward
    values at bf16 tolerance, gradients vs the scattered packed conv."""
    import os

    os.environ["PAIF_PALLAS_ZCONV"] = "1"
    try:
        from paif_tpu.ops.packed import pack, pack_kernel, unpack
        from paif_tpu.ops.pallas.zconv import zconv

        for k, ci, co in ((3, 32, 32), (7, 32, 32), (3, 96, 32), (3, 32, 96)):
            x = jnp.asarray(rng.normal(0, 1, (2, 16, 32, ci)), jnp.float32)
            w = jnp.asarray(rng.normal(0, 0.1, (k, k, ci, co)), jnp.float32)
            pad = (k - 1) // 2
            ref = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            )
            xp = pack(x).astype(jnp.bfloat16)
            wb = w.astype(jnp.bfloat16)
            got = unpack(zconv(xp, wb)).astype(jnp.float32)
            scale = float(jnp.max(jnp.abs(ref)))
            np.testing.assert_allclose(
                np.asarray(got) / scale, np.asarray(ref) / scale, atol=5e-3
            )

            def scat(xq, wv):
                wpk, (rh, rw) = pack_kernel(wv, 1)
                return jax.lax.conv_general_dilated(
                    xq, wpk, (1, 1), [(rh, rh), (rw, rw)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            gz = jax.grad(
                lambda a, b: jnp.sum(jnp.sin(zconv(a, b).astype(jnp.float32))), argnums=(0, 1)
            )(xp, wb)
            gs = jax.grad(
                lambda a, b: jnp.sum(jnp.sin(scat(a, b).astype(jnp.float32))), argnums=(0, 1)
            )(xp, wb)
            for a, b in zip(gz, gs):
                a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
                s = np.max(np.abs(b32)) + 1e-9
                np.testing.assert_allclose(a32 / s, b32 / s, atol=6e-3)
    finally:
        del os.environ["PAIF_PALLAS_ZCONV"]
