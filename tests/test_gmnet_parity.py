"""GMNet output parity vs the reference (with a torchvision stub: the
reference hard-requires torchvision resnet50(pretrained=True), which needs a
download; the stub provides a randomly-initialized torchvision-structured
resnet50 — throughput of weights through both frameworks is what's tested)."""

import sys
import types

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from tests.reference_stubs import install_reference_stubs
from tests.test_resnet_parity import TorchBottleneck

install_reference_stubs()


def _install_torchvision_stub():
    class TVResNet50(nn.Module):
        """torchvision attribute layout: conv1/bn1/relu/maxpool/layer1..4."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            in_ch, planes = 64, 64
            for stage, blocks in enumerate((3, 4, 6, 3)):
                layers = []
                for b in range(blocks):
                    stride = (1 if stage == 0 else 2) if b == 0 else 1
                    layers.append(TorchBottleneck(in_ch, planes, stride))
                    in_ch = planes * 4
                setattr(self, f"layer{stage + 1}", nn.Sequential(*layers))
                planes *= 2

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet50 = lambda pretrained=False, **kw: TVResNet50()
    tv.models = tv_models
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv_models)


_install_torchvision_stub()


def test_gmnet_parity(rng):
    from core.GMNet import GMNet as RefGMNet

    from paif_tpu.models.zoo.seg_zoo import GMNet

    torch.manual_seed(0)
    ref = RefGMNet(9).eval()

    depth = rng.uniform(0, 1, (1, 1, 64, 64)).astype(np.float32)
    rgb = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(depth), torch.from_numpy(rgb)).numpy()

    model = GMNet(n_classes=9)
    jd = jnp.asarray(depth.transpose(0, 2, 3, 1))
    jr = jnp.asarray(rgb.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jd, jr)
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"]))
    sd = {k: v for k, v in ref.state_dict().items()}

    def conv(fpath, tkey, bias=False):
        params[fpath + ("kernel",)] = jnp.asarray(
            np.transpose(sd[f"{tkey}.weight"].numpy(), (2, 3, 1, 0))
        )
        if bias:
            params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())

    def bn(fpath, tkey):
        params[fpath + ("scale",)] = jnp.asarray(sd[f"{tkey}.weight"].numpy())
        params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())
        stats[fpath + ("mean",)] = jnp.asarray(sd[f"{tkey}.running_mean"].numpy())
        stats[fpath + ("var",)] = jnp.asarray(sd[f"{tkey}.running_var"].numpy())

    def resnet(fprefix, tprefix, in1=3):
        conv(fprefix + ("conv1",), f"{tprefix}_conv1")
        bn(fprefix + ("bn1",), f"{tprefix}_bn1")
        for stage, blocks in enumerate((3, 4, 6, 3)):
            for b in range(blocks):
                f = fprefix + (f"layer{stage + 1}_{b}",)
                t = f"{tprefix}_layer{stage + 1}.{b}"
                for i in (1, 2, 3):
                    conv(f + (f"conv{i}",), f"{t}.conv{i}")
                    bn(f + (f"bn{i}",), f"{t}.bn{i}")
                if b == 0:
                    conv(f + ("ds_conv",), f"{t}.downsample.0")
                    bn(f + ("ds_bn",), f"{t}.downsample.1")

    resnet(("encoder_rgb",), "encoder_rgb")
    # thermal encoder: conv1 is the 1-channel mean kernel; my flax backbone
    # takes the replicated 3-channel input, so divide by 3 to match
    params[("encoder_thermal", "conv1", "kernel")] = jnp.asarray(
        np.repeat(
            np.transpose(sd["encoder_thermal_conv1.weight"].numpy(), (2, 3, 1, 0)), 3, axis=2
        )
        / 3.0
    )
    bn(("encoder_thermal", "bn1"), "encoder_thermal_bn1")
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            f = ("encoder_thermal", f"layer{stage + 1}_{b}")
            t = f"encoder_thermal_layer{stage + 1}.{b}"
            for i in (1, 2, 3):
                conv(f + (f"conv{i}",), f"{t}.conv{i}")
                bn(f + (f"bn{i}",), f"{t}.bn{i}")
            if b == 0:
                conv(f + ("ds_conv",), f"{t}.downsample.0")
                bn(f + ("ds_bn",), f"{t}.downsample.1")

    def bbasic(fpath, tkey):  # BBasicConv2d: conv -> bn -> relu
        conv(fpath + ("conv",), f"{tkey}.basicconv.0")
        bn(fpath + ("bn",), f"{tkey}.basicconv.1")

    def dense_fuse(fpath, tkey):  # Fuseblock -> DenseFuseLayer
        bbasic(fpath + ("fuse_down_mul",), f"{tkey}.dense.fuse_down_mul")
        conv(fpath + ("res_main", "down"), f"{tkey}.dense.res_main.down", bias=True)
        for i in range(4):
            bbasic(fpath + ("res_main", f"dense{i}"), f"{tkey}.dense.res_main.denseblock.{i}")
        bbasic(fpath + ("res_main", "fuse"), f"{tkey}.dense.res_main.fuse")
        bbasic(fpath + ("fuse_main",), f"{tkey}.dense.fuse_main")

    def gm_basic(fpath, tkey):  # GMNet BasicConv2d: conv -> bn (no relu)
        conv(fpath + ("conv",), f"{tkey}.conv")
        bn(fpath + ("bn",), f"{tkey}.bn")

    def cmc(fpath, tkey):
        conv(fpath + ("down",), f"{tkey}.down", bias=True)
        for i in (1, 2, 3):
            base = fpath + (f"dil{i}",)
            tb = f"{tkey}.denseblock.{i - 1}.cov"
            conv(base + ("conv_1k",), f"{tb}.0.conv")
            bn(base + ("bn_1k",), f"{tb}.0.bn")
            conv(base + ("conv_k1",), f"{tb}.1.conv")
            bn(base + ("bn_k1",), f"{tb}.1.bn")
            conv(base + ("conv_d",), f"{tb}.2.conv")
            bn(base + ("bn_d",), f"{tb}.2.bn")
        bbasic(fpath + ("fuse",), f"{tkey}.fuse")

    for i in (1, 2, 3):
        dense_fuse((f"densefuse{i}",), f"densefuse{i}")
        cmc((f"in{i}",), f"in{i}")
        cmc((f"gc{i}",), f"gc{i}")
    for tp in (3, 4, 5):
        conv((f"tp{tp}",), f"tp{tp}", bias=True)

    def decoder(fpath, tkey):
        for i in range(3):
            gm_basic(fpath + (f"block{i}_conv",), f"{tkey}.block{i + 1}.0")
            bn(fpath + (f"block{i}_bn",), f"{tkey}.block{i + 1}.1")

    decoder(("decoder3",), "decoder3")
    decoder(("decoder2",), "decoder2")
    conv(("classfier1",), "classfier1.0")

    got = model.apply(
        {"params": unflatten_dict(params), "batch_stats": unflatten_dict(stats)}, jd, jr
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )
