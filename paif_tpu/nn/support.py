"""Support blocks from the reference search space that the searched genotype
does not use but the framework surface includes (operations_m.py:206-338,
466-534; model_fusion_auto.py:118-224): blur-pool up/down-sampling residual
blocks, total-variation SE attention, DRDB, SKFF, ReLUConvBN, Identity.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import get_precision, BatchNorm, Conv, PReLU
from paif_tpu.ops.blurpool import blur_pool
from paif_tpu.ops.resize import resize_bilinear


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class ReLUConvBN(nn.Module):
    """operations_m.py:481-492."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        x = Conv(self.features, self.kernel_size, stride=self.stride, padding=self.padding, name="conv")(x)
        return BatchNorm(affine=self.affine, name="bn")(x, use_running_average=not train)


class EnhanceResidualModule(nn.Module):
    """operations_m.py:466-479: two dilated depthwise convs + pointwise + BN + PReLU, residual."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features
        r = Conv(c, 5, dilation=2, groups=c, name="dw5")(x)
        r = Conv(c, 3, dilation=2, groups=c, name="dw3")(r)
        r = Conv(c, 1, name="pw")(r)
        r = BatchNorm(name="bn")(r, use_running_average=not train)
        r = PReLU(name="act")(r)
        return x + r


class ResidualDownSample(nn.Module):
    """operations_m.py:206-224: two-path 2x downsample via blur-pool."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        top = Conv(c, 1, name="top_conv1")(x)
        top = PReLU(name="top_act1")(top)
        top = Conv(c, 3, name="top_conv3")(top)
        top = PReLU(name="top_act2")(top)
        top = blur_pool(top, filt_size=3, stride=2)
        top = Conv(c * 2, 1, name="top_conv_out")(top)
        bot = blur_pool(x, filt_size=3, stride=2)
        bot = Conv(c * 2, 1, name="bot_conv")(bot)
        return top + bot


class DownSample(nn.Module):
    """operations_m.py:227-241: log2(scale) stacked ResidualDownSamples."""

    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        for i in range(int(math.log2(self.scale_factor))):
            x = ResidualDownSample(name=f"stage{i}")(x, train)
        return x


class ConvTranspose2dTorch(nn.Module):
    """torch ConvTranspose2d(k3, s2, p1, output_padding=1) exact semantics:
    lhs-dilated conv with pad (k-1-p, k-1-p+op) and spatially flipped taps.
    Kernel stored HWIO pre-flipped (torch_import kind=DECONV maps weights).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        ).astype(x.dtype)
        lo, hi = k - 1 - p, k - 1 - p + op
        import jax

        return jax.lax.conv_general_dilated(
            x,
            kernel,
            (1, 1),
            [(lo, hi), (lo, hi)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=get_precision(),
        )


class ResidualUpSample(nn.Module):
    """operations_m.py:244-262: transposed-conv + bilinear two-path 2x upsample."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        top = Conv(c, 1, name="top_conv1")(x)
        top = PReLU(name="top_act1")(top)
        top = ConvTranspose2dTorch(c, name="top_deconv")(top)
        top = PReLU(name="top_act2")(top)
        top = Conv(c // 2, 1, name="top_conv_out")(top)
        bot = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)
        bot = Conv(c // 2, 1, name="bot_conv")(bot)
        return top + bot


class UpSample(nn.Module):
    """operations_m.py:264-278."""

    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        for i in range(int(math.log2(self.scale_factor))):
            x = ResidualUpSample(name=f"stage{i}")(x, train)
        return x


def total_variation_map(x: jnp.ndarray) -> jnp.ndarray:
    """operations_m.py:286-292: (f-g)^2 + (f-h)^2 on shifted crops."""
    f = x[:, :-1, :-1, :]
    g = x[:, :-1, 1:, :]
    h = x[:, 1:, :-1, :]
    return (f - g) ** 2 + (f - h) ** 2


class SETVLayer(nn.Module):
    """operations_m.py:293-312: channel gate from pooled TV statistics."""

    reduction: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        tv = total_variation_map(x)
        y = jnp.mean(tv, axis=(1, 2))  # (B, C)
        y = nn.relu(nn.Dense(self.reduction, precision=get_precision(), name="fc1")(y))
        y = nn.sigmoid(nn.Dense(x.shape[-1], precision=get_precision(), name="fc2")(y))
        return x * y[:, None, None, :]


class TVBasicBlock(nn.Module):
    """operations_m.py:313-338."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        from paif_tpu.nn.layers import Conv3x3

        prelu = PReLU(name="act")
        y = Conv3x3(self.features, name="conv1")(x)
        out = prelu(y)
        out = Conv3x3(self.features, name="conv2")(out)
        out = SETVLayer(name="se")(out, train)
        return prelu(out + y)


class DRDB(nn.Module):
    """5-layer dilated residual dense block (model_fusion_auto.py:118-158)."""

    features: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cat = x
        for i in range(5):
            y = nn.relu(Conv(self.growth, 3, dilation=2, use_bias=True, name=f"dconv{i + 1}")(cat))
            cat = jnp.concatenate([cat, y], axis=-1)
        out = Conv(self.features, 1, use_bias=True, name="conv_out")(cat)
        return x + nn.relu(out)


class SKFF(nn.Module):
    """Selective-kernel feature fusion (model_fusion_auto.py:190-224 ==
    operations_m.py:399-433): softmax attention over branch descriptors."""

    height: int = 3
    reduction: int = 8

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        assert len(feats) == self.height
        c = feats[0].shape[-1]
        d = max(c // self.reduction, 4)
        u = sum(feats)
        s = jnp.mean(u, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        z = PReLU(name="du_act")(Conv(d, 1, name="conv_du")(s))
        att = jnp.stack(
            [Conv(c, 1, name=f"fc{i}")(z) for i in range(self.height)], axis=1
        )  # (B, height, 1, 1, C)
        att = nn.softmax(att, axis=1)
        stacked = jnp.stack(feats, axis=1)
        return jnp.sum(stacked * att, axis=1)
