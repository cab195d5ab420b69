"""Baseline fusion networks (reference fusion_model/*), NHWC flax.

All take (ir, vis, train=False) with channel 0 of each used, returning the
fused luminance (B,H,W,1) — the interface PAIFJoint's CompModel role expects.
Internal argument roles follow each reference net.

Reference quirks preserved:
  * SeaFusion's ConvBnLeakyRelu2d/ConvBnTanh2d *define* BatchNorms but never
    apply them in forward (SeaFusion.py:15-24) — we create no such params.
  * SeaFusion's Sobel convs are TRAINABLE depthwise convs initialized to the
    sobel kernels (SeaFusion.py:37-51).
  * ReCoNet runs a fixed-depth recurrent refinement with shared weights
    (Reconet.py:55-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from paif_tpu.nn.layers import get_precision, BatchNorm, Conv, PReLU


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


class U2Fusion(nn.Module):
    """fusion_model/U2Fusion.py:102-125: 2-ch input, 5 dense layers growth 44,
    128->64->32->1 head with tanh. LeakyReLU slope 0.2, conv bias=True."""

    features: int = 44
    growth: int = 44
    num_dense: int = 5

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.concatenate([ir[..., 0:1], vis[..., 0:1]], axis=-1)
        x = _lrelu(Conv(self.features, 3, use_bias=True, name="conv_1")(x))
        for i in range(self.num_dense):
            out = _lrelu(Conv(self.growth, 3, use_bias=True, name=f"dense{i}")(x))
            x = jnp.concatenate([x, out], axis=-1)
        x = _lrelu(Conv(128, 3, use_bias=True, name="sub0")(x))
        x = _lrelu(Conv(64, 3, use_bias=True, name="sub1")(x))
        x = _lrelu(Conv(32, 3, use_bias=True, name="sub2")(x))
        return jnp.tanh(Conv(1, 3, use_bias=True, name="out")(x))


class _RGBD(nn.Module):
    """SeaFusion RGBD block: dense branch + trainable-sobel gradient branch."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.in_ch
        d1 = _lrelu(Conv(c, 3, use_bias=True, name="dense_conv1")(x))
        cat1 = jnp.concatenate([x, d1], axis=-1)
        d2 = _lrelu(Conv(c, 3, use_bias=True, name="dense_conv2")(cat1))
        dense = jnp.concatenate([cat1, d2], axis=-1)
        x1 = Conv(self.out_ch, 1, use_bias=True, name="convdown")(dense)

        sobel = np.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], np.float32)

        def sobel_init(k):
            def init(_key, shape, dtype=jnp.float32):
                return jnp.broadcast_to(jnp.asarray(k, dtype)[:, :, None, None], shape)

            return init

        gx = nn.Conv(
            c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c, use_bias=False,
            kernel_init=sobel_init(sobel), precision=get_precision(), name="sobel_x",
        )(x)
        gy = nn.Conv(
            c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c, use_bias=False,
            kernel_init=sobel_init(sobel.T), precision=get_precision(), name="sobel_y",
        )(x)
        x2 = Conv(self.out_ch, 1, use_bias=True, name="convup")(jnp.abs(gx) + jnp.abs(gy))
        return _lrelu(x1 + x2, 0.1)


class SeaFusion(nn.Module):
    """fusion_model/SeaFusion.py:86-125: dual RGBD encoders + 4 decode convs,
    tanh/2 + 0.5 output."""

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ch = (16, 32, 48)
        v = _lrelu(Conv(ch[0], 3, use_bias=True, name="vis_conv")(vis[..., 0:1]))
        v = _RGBD(ch[0], ch[1], name="vis_rgbd1")(v)
        v = _RGBD(ch[1], ch[2], name="vis_rgbd2")(v)
        i = _lrelu(Conv(ch[0], 3, use_bias=True, name="inf_conv")(ir[..., 0:1]))
        i = _RGBD(ch[0], ch[1], name="inf_rgbd1")(i)
        i = _RGBD(ch[1], ch[2], name="inf_rgbd2")(i)
        x = jnp.concatenate([v, i], axis=-1)
        x = _lrelu(Conv(ch[1] * 2, 3, use_bias=True, name="decode4")(x))
        x = _lrelu(Conv(ch[0] * 2, 3, use_bias=True, name="decode3")(x))
        x = _lrelu(Conv(ch[0], 3, use_bias=True, name="decode2")(x))
        return jnp.tanh(Conv(1, 3, use_bias=True, name="decode1")(x)) / 2.0 + 0.5


class SDNet(nn.Module):
    """fusion_model/SDNet.py:6-47: dual dense stacks -> 128-ch 1x1 fuse, tanh.
    (The decomposition branch convs 5x-7x are training-time only and unused
    in forward, as in the reference.)"""

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def stack(x, suffix):
            x1 = _lrelu(Conv(16, 5, use_bias=True, name=f"conv1{suffix}")(x), 0.01)
            x2 = _lrelu(Conv(16, 3, use_bias=True, name=f"conv2{suffix}")(x1), 0.01)
            x3 = _lrelu(
                Conv(16, 3, use_bias=True, name=f"conv3{suffix}")(jnp.concatenate([x1, x2], -1)),
                0.01,
            )
            x4 = _lrelu(
                Conv(16, 3, use_bias=True, name=f"conv4{suffix}")(
                    jnp.concatenate([x1, x2, x3], -1)
                ),
                0.01,
            )
            return [x1, x2, x3, x4]

        a = stack(ir[..., 0:1], "1")
        b = stack(vis[..., 0:1], "2")
        fused = Conv(1, 1, use_bias=True, name="fuse")(jnp.concatenate(a + b, axis=-1))
        return jnp.tanh(fused)


class ReCoNet(nn.Module):
    """fusion_model/Reconet.py:55-105: recurrent attention + dilated DGroup
    decoder, `depth` refinement iterations with shared weights."""

    depth: int = 3
    dim: int = 64
    use_bn: bool = False

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        i1, i2 = ir[..., 0:1], vis[..., 0:1]

        att_a = Conv(1, 3, use_bias=False, name="att_a_conv")
        att_b = Conv(1, 3, use_bias=False, name="att_b_conv")

        def attention(conv, a, b):
            cat = jnp.concatenate([a, b], axis=-1)
            mx = jnp.max(cat, axis=-1, keepdims=True)
            avg = jnp.mean(cat, axis=-1, keepdims=True)
            return nn.sigmoid(conv(jnp.concatenate([mx, avg], axis=-1)))

        dconvs = [
            Conv(self.dim, 3, dilation=d + 1, use_bias=True, name=f"dgroup_d{d}")
            for d in range(3)
        ]
        dnorms = [BatchNorm(name=f"dgroup_bn{d}") for d in range(3)] if self.use_bn else None
        conv_s = Conv(1, 3, use_bias=True, name="dgroup_s")

        i_f = jnp.maximum(i1, i2)
        for _ in range(self.depth):
            a = attention(att_a, i1, i_f)
            b = attention(att_b, i2, i_f)
            x = jnp.concatenate([i1 * a, i_f, i2 * b], axis=-1)
            feats = []
            for d in range(3):
                f = dconvs[d](x)
                if dnorms is not None:
                    f = dnorms[d](f, use_running_average=not train)
                # exact erf GELU in f32: see models/mit.py _gelu (bf16 erf
                # after a conv hits a pathological XLA lowering on TPU)
                feats.append(
                    jax.nn.gelu(f.astype(jnp.float32), approximate=False).astype(f.dtype)
                )
            i_f = jnp.tanh(conv_s(jnp.concatenate(feats, axis=-1)))
        return i_f


class DID(nn.Module):
    """fusion_model/AUIF.py:131-150 (AUIF/DID): two AE encoders splitting
    base/detail via tanh convs, features averaged, shared decoder."""

    channel: int = 64

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.channel

        def conv_bn(x, feats, name, pad_reflect=False, act="prelu"):
            if pad_reflect:
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                x = Conv(feats, 3, padding=0, use_bias=True, name=f"{name}_conv")(x)
            else:
                x = Conv(feats, 3, use_bias=True, name=f"{name}_conv")(x)
            x = BatchNorm(name=f"{name}_bn")(x, use_running_average=not train)
            if act == "prelu":
                return PReLU(name=f"{name}_act")(x)
            if act == "tanh":
                return jnp.tanh(x)
            return nn.sigmoid(x)

        def encoder(x, p):
            f1 = conv_bn(x[..., 0:1], c, f"{p}_cov1", pad_reflect=True)
            f2 = conv_bn(f1, c, f"{p}_cov2")
            fb = conv_bn(f2, c, f"{p}_cov3", act="tanh")
            fd = conv_bn(f2, c, f"{p}_cov4", act="tanh")
            return f1, f2, fb, fd

        i1, i2, ib, idt = encoder(ir, "enc1")
        v1, v2, vb, vd = encoder(vis, "enc2")
        f1, f2 = (i1 + v1) / 2, (i2 + v2) / 2
        fb, fd = (ib + vb) / 2, (idt + vd) / 2
        o1 = conv_bn(jnp.concatenate([fb, fd], -1), c, "dec_cov5")
        o2 = conv_bn(jnp.concatenate([o1, f2], -1), c, "dec_cov6")
        return conv_bn(jnp.concatenate([o2, f1], -1), 1, "dec_cov7", pad_reflect=True, act="sigmoid")


# Simple aggregation-strategy ablations (model_fusion_auto.py:1232-1349):
class FusionAdd(nn.Module):
    @nn.compact
    def __call__(self, ir, vis, train: bool = False):
        return ir[..., 0:1] + vis[..., 0:1]


class FusionAverage(nn.Module):
    @nn.compact
    def __call__(self, ir, vis, train: bool = False):
        return (ir[..., 0:1] + vis[..., 0:1]) / 2.0


class FusionMax(nn.Module):
    @nn.compact
    def __call__(self, ir, vis, train: bool = False):
        return jnp.maximum(ir[..., 0:1], vis[..., 0:1])
