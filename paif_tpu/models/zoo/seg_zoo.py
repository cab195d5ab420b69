"""RGB-T segmentation comparison networks (reference core/{LASNet,EGFNet,
GMNet}.py), NHWC flax, on the shared ResNet-50 backbone.

Interface matches the reference: __call__(depth, rgb, train) where `depth`
carries the thermal channel in channel 0 (LASNet.py:263-266); returns
full-resolution class logits.

Reference quirks preserved:
  * LASNet/EGFNet share ONE backbone across both modalities (the thermal map
    is replicated to 3 channels); GMNet uses two separate encoders.
  * Modules whose outputs the reference computes but never consumes (LASNet
    CLM5/CAM4/CAM3 feed a decoder that ignores them; GMNet gc2/gc3 likewise)
    are instantiated and computed for structural parity — XLA dead-code
    eliminates them at compile time.
  * GMNet's BasicConv2d defines a ReLU but forward applies only conv+bn
    (GMNet.py:724-727); its decoder blocks therefore run conv-bn-bn-relu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import get_precision, BatchNorm
from paif_tpu.models.zoo.resnet import ResNet50Backbone
from paif_tpu.ops.resize import resize_bilinear


def _conv(features, kernel, stride=1, dilation=1, bias=False, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        precision=get_precision(),
        name=name,
    )


def _up2(x, align=True):
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=align)


class BasicConv2dLN(nn.Module):
    """LASNet BasicConv2d: conv -> BN -> LeakyReLU(0.1) (LASNet.py:41-55)."""

    features: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = _conv(self.features, self.kernel, dilation=self.dilation, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return jnp.where(x >= 0, x, 0.1 * x)


class CorrelationModule(nn.Module):
    """LASNet.py:87-108: cross-feature correlation attention."""

    channels: int

    @nn.compact
    def __call__(self, exemplar, query, train=False):
        b, h, w, c = exemplar.shape
        ex = exemplar.reshape(b, h * w, c)
        qu = query.reshape(b, h * w, c).transpose(0, 2, 1)  # (B,C,N)
        ex_corr = nn.Dense(c, use_bias=False, precision=get_precision(), name="linear_e")(ex)
        a = jnp.einsum("bnc,bcm->bnm", ex_corr, qu, precision=get_precision())  # (B,N,N)
        # reference: softmax(transpose(A,1,2), dim=1) then bmm(query_flat, B)
        bmat = jax.nn.softmax(a.transpose(0, 2, 1), axis=1)
        att = jnp.einsum("bcm,bmn->bcn", qu, bmat, precision=get_precision())
        att = att.transpose(0, 2, 1).reshape(b, h, w, c)
        return BasicConv2dLN(c, name="fusion")(att, train)


class CLM(nn.Module):
    """LASNet.py:110-130."""

    channels: int

    @nn.compact
    def __call__(self, x, x_ir, ir, train=False):
        c1 = CorrelationModule(self.channels, name="corr_x")(x_ir, x, train)
        c2 = CorrelationModule(self.channels, name="corr_ir")(x_ir, ir, train)
        s = BasicConv2dLN(self.channels, name="smooth1")(c1 + c2, train)
        m = BasicConv2dLN(self.channels, name="smooth2")(c1 * c2, train)
        fusion = BasicConv2dLN(self.channels, name="fusion")(
            jnp.concatenate([s, m], -1), train
        )
        pred = _conv(2, 3, bias=True, name="pred")(fusion)
        return fusion, pred


class ChannelAttnTorchCAM(nn.Module):
    """Dual-attention CAM_Module (LASNet.py:10-39): channel self-attention
    with the max-energy subtraction trick and a learned gamma (init 0)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c).transpose(0, 2, 1)  # (B,C,N)
        energy = jnp.einsum("bcn,bdn->bcd", flat, flat, precision=get_precision())
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bcd,bdn->bcn", attn, flat, precision=get_precision())
        out = out.transpose(0, 2, 1).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class LASCAM(nn.Module):
    """LASNet.py:133-151: spatial-gated sum + channel self-attention."""

    channels: int

    @nn.compact
    def __call__(self, x, ir, train=False):
        mult = x * ir
        summ = BasicConv2dLN(self.channels, name="conv2")(x + ir, train)
        sa_in = jnp.max(mult, axis=-1, keepdims=True)
        sa = nn.sigmoid(_conv(1, 3, name="sa_conv")(sa_in))
        return ChannelAttnTorchCAM(name="cam")(summ * sa)


class ESM(nn.Module):
    """LASNet.py:154-177: dilated edge module."""

    channels: int

    @nn.compact
    def __call__(self, x, ir, train=False):
        c = self.channels
        mult = BasicConv2dLN(c, name="conv1")(x * ir, train)
        summ = BasicConv2dLN(c, name="conv2")(x + ir, train)
        fusion = summ + mult
        parts = [
            BasicConv2dLN(c // 4, 3, dilation=d, name=f"dconv{i + 1}")(fusion, train)
            for i, d in enumerate((1, 3, 5, 7))
        ]
        out = _conv(c, 3, bias=True, name="fuse_dconv")(jnp.concatenate(parts, -1))
        edge = _conv(2, 3, bias=True, name="pred")(out)
        return out, edge


class LASNet(nn.Module):
    """core/LASNet.py:236-300."""

    n_classes: int = 9

    @nn.compact
    def __call__(self, depth, rgb, train: bool = False):
        ir = jnp.repeat(depth[..., 0:1], 3, axis=-1)
        backbone = ResNet50Backbone(name="backbone")
        xs = backbone(rgb, train)
        irs = backbone(ir, train)

        red_ch = (64, 128, 256, 256, 512)
        reds = [
            BasicConv2dLN(red_ch[i], name=f"rgbconv{i + 1}") for i in range(5)
        ]
        xs = [reds[i](xs[i], train) for i in range(5)]
        irs = [reds[i](irs[i], train) for i in range(5)]

        out5, _sal = CLM(512, name="CLM5")(xs[4], xs[4] * irs[4], irs[4], train)
        out4 = LASCAM(256, name="CAM4")(xs[3], irs[3], train)
        out3 = LASCAM(256, name="CAM3")(xs[2], irs[2], train)
        out2 = LASCAM(128, name="CAM2")(xs[1], irs[1], train)
        out1, _edge = ESM(64, name="ESM1")(xs[0], irs[0], train)
        del out5, out4  # computed for parity; the decoder ignores them

        def dec_block(x, c_mid, c_out, name):
            x = BasicConv2dLN(c_mid, 3, dilation=3, name=f"{name}_a")(x, train)
            x = BasicConv2dLN(c_out, 3, name=f"{name}_b")(x, train)
            return _up2(x, align=True)

        x3d = dec_block(out3, 256, 128, "decoder3")
        x2d = dec_block(x3d + out2, 128, 64, "decoder2")
        x = BasicConv2dLN(64, 3, dilation=3, name="decoder1_a")(x2d + out1, train)
        x = BasicConv2dLN(64, 3, name="decoder1_b")(x, train)
        x = _up2(x, align=True)
        x = BasicConv2dLN(64, 3, name="decoder1_c")(x, train)
        return _conv(self.n_classes, 3, bias=True, name="decoder1_pred")(x)


class OLM(nn.Module):
    """EGFNet olm (EGFNet.py:69-121): gated fuse + dilated pyramid."""

    channels: int
    aux_channels: int

    @nn.compact
    def __call__(self, x, ir, train=False):
        c = self.channels
        s = x + ir
        xx = jnp.concatenate([x * s, ir * s], axis=-1)
        xx = _conv(c, 1, bias=True, name="conv0")(xx)
        n = BasicConv2dEGF(c, name="rconv")(xx, train)
        n = _conv(c, 3, bias=True, name="rrconv")(n)
        n = BatchNorm(name="rrbn")(n, use_running_average=not train)
        xx = nn.relu(xx + n)
        parts = [xx] + [
            _conv(c, 3, dilation=d, bias=True, name=f"conv{d}")(xx) for d in (1, 2, 3, 4)
        ]
        xp = _conv(c, 3, bias=True, name="conv")(jnp.concatenate(parts, -1))
        x_s = BasicConv2dEGF(self.aux_channels, name="convs")(xp, train)
        return x_s, xp


class BasicConv2dEGF(nn.Module):
    """conv(3x3, bias) -> BN -> ReLU sequence used across EGFNet."""

    features: int

    @nn.compact
    def __call__(self, x, train=False):
        x = _conv(self.features, 3, bias=True, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class EGFNet(nn.Module):
    """core/EGFNet.py:204-317 (the active forward path; large parts of the
    reference are commented out upstream)."""

    n_classes: int = 9

    @nn.compact
    def __call__(self, depth, rgb, train: bool = False):
        ir = jnp.repeat(depth[..., 0:1], 3, axis=-1)
        backbone = ResNet50Backbone(name="backbone")
        xs = backbone(rgb, train)
        irs = backbone(ir, train)

        red = [
            _conv(64, 3, bias=True, name=f"rgbconv{i + 1}") for i in range(4)
        ]
        x1, x2, x3 = red[0](xs[0]), red[1](xs[1]), red[2](xs[2])
        ir1, ir2, ir3 = red[0](irs[0]), red[1](irs[1]), red[2](irs[2])
        _x4 = red[3](xs[3])  # computed in the reference, unused downstream

        _b3, out3 = OLM(64, 2, name="em3")(x3, ir3, train)
        _b2, out2 = OLM(64, 2, name="em2")(x2, ir2, train)
        _b1, out1 = OLM(64, 2, name="em1")(x1, ir1, train)

        high2 = _up2(out3, align=False)
        out21 = out2 + high2  # EM2 is a bare addition (EGFNet.py:156-166)
        f2 = _up2(out21, align=False)
        out11 = f2 + out1
        out11 = _up2(out11, align=False)
        sem = _conv(self.n_classes, 1, bias=True, name="finalconv")(out11)
        return sem + sem  # reference adds the prediction to itself (:313-314)


class BBasicConv2d(nn.Module):
    """GMNet BBasicConv2d: conv -> BN -> ReLU (GMNet.py:344-366)."""

    features: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = _conv(self.features, self.kernel, dilation=self.dilation, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class GMBasicConv2d(nn.Module):
    """GMNet BasicConv2d: conv -> BN, NO relu (GMNet.py:715-727 quirk)."""

    features: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = _conv(self.features, self.kernel, dilation=self.dilation, name="conv")(x)
        return BatchNorm(name="bn")(x, use_running_average=not train)


class AsymDilationConvB(nn.Module):
    """GMNet DilationConvB (GMNet.py:577-586): (1,k)+(k,1) then dilated 3x3,
    each conv->bn (no relu, per the BasicConv2d quirk)."""

    features: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x, train=False):
        k, d = self.kernel, self.dilation
        pad = (k - 1) // 2
        x = nn.Conv(
            self.features, (1, k), padding=[(0, 0), (pad, pad)], use_bias=False,
            precision=get_precision(), name="conv_1k",
        )(x)
        x = BatchNorm(name="bn_1k")(x, use_running_average=not train)
        x = nn.Conv(
            self.features, (k, 1), padding=[(pad, pad), (0, 0)], use_bias=False,
            precision=get_precision(), name="conv_k1",
        )(x)
        x = BatchNorm(name="bn_k1")(x, use_running_average=not train)
        x = _conv(self.features, 3, dilation=d, name="conv_d")(x)
        return BatchNorm(name="bn_d")(x, use_running_average=not train)


class DenseLayerGM(nn.Module):
    """GMNet DenseLayer (GMNet.py:265-295)."""

    out_ch: int
    down_factor: int = 4
    k: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.out_ch // self.down_factor
        down = _conv(mid, 1, bias=True, name="down")(x)
        outs = []
        feats = down
        for i in range(self.k):
            feats = BBasicConv2d(mid, name=f"dense{i}")(
                jnp.concatenate(outs + [down], -1), train
            )
            outs.append(feats)
        return BBasicConv2d(self.out_ch, name="fuse")(jnp.concatenate([x, feats], -1), train)


class CMC(nn.Module):
    """GMNet CMC (GMNet.py:297-327): dense chain of asymmetric dilated convs."""

    out_ch: int
    down_factor: int = 4
    k: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.out_ch // self.down_factor
        down = _conv(mid, 1, bias=True, name="down")(x)
        outs = []
        feats = down
        for i in range(1, self.k + 1):
            feats = AsymDilationConvB(mid, 2 * i + 1, 2 * i + 1, name=f"dil{i}")(
                jnp.concatenate(outs + [down], -1), train
            )
            outs.append(feats)
        return BBasicConv2d(self.out_ch, name="fuse")(jnp.concatenate([x, feats], -1), train)


class Fuseblock(nn.Module):
    """GMNet Fuseblock -> DenseFuseLayer (GMNet.py:330-341, 516-537)."""

    in_ch: int

    @nn.compact
    def __call__(self, rgb, depth, train=False):
        x1 = rgb + depth
        x2 = rgb * depth
        feat = BBasicConv2d(self.in_ch, name="fuse_down_mul")(x1 + x2, train)
        res = DenseLayerGM(self.in_ch, down_factor=self.in_ch // 64, name="res_main")(feat, train)
        return BBasicConv2d(64, name="fuse_main")(res + feat, train)


class GMDecoder(nn.Module):
    """GMNet decoder (GMNet.py:594-619): 3 conv-bn(+bn-relu) blocks, residual,
    2x upsample (align_corners=True)."""

    channels: int = 64

    @nn.compact
    def __call__(self, x, train=False):
        h = x
        for i in range(3):
            h = GMBasicConv2d(self.channels, name=f"block{i}_conv")(h, train)
            h = BatchNorm(name=f"block{i}_bn")(h, use_running_average=not train)
            h = nn.relu(h)
        return _up2(h + x, align=True)


class GMNet(nn.Module):
    """core/GMNet.py:19-260 (active forward path)."""

    n_classes: int = 9

    @nn.compact
    def __call__(self, depth, rgb, train: bool = False):
        thermal = jnp.repeat(depth[..., 0:1], 3, axis=-1)
        rgb_enc = ResNet50Backbone(name="encoder_rgb")
        th_enc = ResNet50Backbone(name="encoder_thermal")
        r = rgb_enc(rgb, train)  # [div2..div32]
        t = th_enc(thermal, train)

        df3 = Fuseblock(2048, name="densefuse3")(r[4], t[4], train)
        in3 = CMC(64, name="in3")(df3, train)
        sum3 = in3 + _conv(64, 1, bias=True, name="tp5")(r[4])
        _gc3 = CMC(64, name="gc3")(sum3, train)  # parity: computed, unused

        df2 = Fuseblock(1024, name="densefuse2")(r[3], t[3], train)
        in2 = CMC(64, name="in2")(df2, train)
        sum2 = in2 + _conv(64, 1, bias=True, name="tp4")(r[3])
        _gc2 = CMC(64, name="gc2")(sum2, train)  # parity: computed, unused

        df1 = Fuseblock(512, name="densefuse1")(r[2], t[2], train)
        in1 = CMC(64, name="in1")(df1, train)
        sum1 = in1 + _conv(64, 1, bias=True, name="tp3")(r[2])
        gc1 = CMC(64, name="gc1")(sum1, train)

        de3 = GMDecoder(name="decoder3")(gc1, train)
        out1 = GMDecoder(name="decoder2")(de3, train)
        sem = _conv(self.n_classes, 1, name="classfier1")(out1)
        return _up2(sem, align=True)
