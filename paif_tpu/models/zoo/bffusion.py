"""BFFR (fusion_model/BFFusion.py:235-328): NestFuse-style nested-UNet fusion
with per-scale transposed-QK self-attention fusion blocks, NHWC flax.

Reference semantics:
  * ConvLayer: reflection pad -> conv(bias) -> LeakyReLU(0.01) (is_last skips
    the activation); ConvLayerLast ends in tanh/2 + 0.5.
  * SelfAttention (:169-220): 2 conv-bn-relu pre layers, LINEAR attention on
    the transposed Gram matrix — softmax over dim -2 of (q^T k) * scale,
    applied as v @ ctx — then LayerNorm, 2 conv-bn-relu FFN layers, gated
    residual skip + skip * attn.
  * Decoder up-sampling is NEAREST (torch nn.Upsample default) followed by
    reflection-padding to the skip's spatial shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import get_precision, BatchNorm


def _reflect_conv(x, features, kernel, name_scope, bias=True):
    pad = kernel // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return nn.Conv(
        features, (kernel, kernel), padding="VALID", use_bias=bias,
        precision=get_precision(), name=name_scope,
    )(x)


class ConvLayer(nn.Module):
    features: int
    kernel: int = 3
    is_last: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        x = _reflect_conv(x, self.features, self.kernel, "conv")
        if not self.is_last:
            x = jnp.where(x >= 0, x, 0.01 * x)
        return x


class DenseBlockBF(nn.Module):
    features: int  # output channels
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]

        def clr(y, feats, name):
            y = nn.Conv(
                feats, (self.kernel, self.kernel),
                padding=[(self.kernel // 2,) * 2] * 2, use_bias=True,
                precision=get_precision(), name=name,
            )(y)
            return jnp.where(y >= 0, y, 0.2 * y)

        x1 = clr(x, c, "conv1")
        cat1 = jnp.concatenate([x, x1], -1)
        x2 = clr(cat1, c, "conv2")
        cat2 = jnp.concatenate([cat1, x2], -1)
        down = nn.Conv(self.features, (1, 1), use_bias=True, precision=get_precision(), name="conv_down")(cat2)
        return jnp.where(down >= 0, down, 0.1 * down)


class BFSelfAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, train=False):
        skip = x

        def f_conv(y, name):
            y = _reflect_conv(y, self.dim, 3, name)
            y = BatchNorm(name=f"{name}_bn")(y, use_running_average=not train)
            return nn.relu(y)

        x = f_conv(f_conv(x, "pre0"), "pre1")
        b, h, w, c = x.shape
        n = h * w
        hd = c // self.num_heads
        tokens = x.reshape(b, n, c)
        q = nn.Dense(c, use_bias=False, precision=get_precision(), name="wq1")(tokens)
        k = nn.Dense(c, use_bias=False, precision=get_precision(), name="wk1")(tokens)
        v = nn.Dense(c, use_bias=False, precision=get_precision(), name="wv1")(tokens)

        def heads(t):
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        ctx = jnp.einsum("bhnd,bhne->bhde", q, k, precision=get_precision()) * (hd**-0.5)
        ctx = jax.nn.softmax(ctx, axis=-2)
        out = jnp.einsum("bhnd,bhde->bhne", v, ctx, precision=get_precision())
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, use_bias=True, precision=get_precision(), name="end_proj1")(out)
        out = nn.LayerNorm(epsilon=1e-5, name="norm1")(out).reshape(b, h, w, c)
        out = f_conv(f_conv(out, "ffn0"), "ffn1")
        return skip + skip * out


class FusionBlockRes(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x_ir, x_vi, train=False):
        a = BFSelfAttention(self.dim, self.num_heads, name="attn1")(x_ir, train)
        b = BFSelfAttention(self.dim, self.num_heads, name="attn2")(x_vi, train)
        return (a + b) / 2.0


def _max_pool2(x):
    return nn.max_pool(x, (2, 2), (2, 2))


def _up_to(x_small, target_hw):
    """Nearest 2x upsample + reflect-pad to the target spatial shape."""
    up = jnp.repeat(jnp.repeat(x_small, 2, axis=1), 2, axis=2)
    dh = target_hw[0] - up.shape[1]
    dw = target_hw[1] - up.shape[2]
    if dh or dw:
        up = jnp.pad(
            up,
            ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            mode="reflect",
        )
    return up


class BFFR(nn.Module):
    """Interface: (ir, vis, train) -> fused (B,H,W,1), channel 0 of each used."""

    filters: tuple = (16, 32, 64, 96)
    num_heads: tuple = (4, 8, 8, 16)

    @nn.compact
    def __call__(self, ir, vis, train: bool = False):
        nf = self.filters

        def encode(img, tag):
            # reference quirk: ConvLayer(1, 16, 1, stride) passes stride into
            # the is_last slot (BFFusion.py:256,262) -> the stem is LINEAR
            x = ConvLayer(16, 1, is_last=True, name=f"conv1_{tag}")(img[..., 0:1], train)
            feats = []
            for i, f in enumerate(nf):
                if i > 0:
                    x = _max_pool2(x)
                x = DenseBlockBF(f, name=f"DB{i + 1}_{tag}")(x, train)
                feats.append(x)
            return feats

        en_vi = encode(vis, "vi")
        en_ir = encode(ir, "ir")
        f_en = [
            FusionBlockRes(nf[i], self.num_heads[i], name=f"fusion_block{i + 1}")(
                en_ir[i], en_vi[i], train
            )
            for i in range(4)
        ]

        def light(cat, feats, name):
            return ConvLayer(feats, 3, name=name)(cat, train)

        up = lambda small, big: _up_to(small, big.shape[1:3])  # noqa: E731
        x1_1 = light(jnp.concatenate([f_en[0], up(f_en[1], f_en[0])], -1), nf[0], "DB1_1")
        x2_1 = light(jnp.concatenate([f_en[1], up(f_en[2], f_en[1])], -1), nf[1], "DB2_1")
        x1_2 = light(jnp.concatenate([f_en[0], x1_1, up(x2_1, f_en[0])], -1), nf[0], "DB1_2")
        x3_1 = light(jnp.concatenate([f_en[2], up(f_en[3], f_en[2])], -1), nf[2], "DB3_1")
        x2_2 = light(jnp.concatenate([f_en[1], x2_1, up(x3_1, f_en[1])], -1), nf[1], "DB2_2")
        x1_3 = light(
            jnp.concatenate([f_en[0], x1_1, x1_2, up(x2_2, f_en[0])], -1), nf[0], "DB1_3"
        )
        out = _reflect_conv(x1_3, 1, 1, "conv_out")
        return jnp.tanh(out) / 2.0 + 0.5
