"""LASNet output parity vs the reference. The reference imports a local
`resnet` module ABSENT from its own repo (core/LASNet.py:4); the stub here
provides Backbone_ResNet50_in3 with the conventional 5-way split of a
torchvision-structured resnet50."""

import sys
import types

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from tests.reference_stubs import install_reference_stubs
from tests.test_gmnet_parity import _install_torchvision_stub

install_reference_stubs()
_install_torchvision_stub()


def _install_resnet_stub():
    import torchvision.models as models

    mod = types.ModuleType("resnet")

    def Backbone_ResNet50_in3(pretrained=False):
        net = models.resnet50(pretrained=pretrained)
        div_2 = nn.Sequential(net.conv1, net.bn1, net.relu)
        div_4 = nn.Sequential(net.maxpool, net.layer1)
        return div_2, div_4, net.layer2, net.layer3, net.layer4

    mod.Backbone_ResNet50_in3 = Backbone_ResNet50_in3
    mod.Backbone_ResNet50_in1 = Backbone_ResNet50_in3
    mod.Backbone_ResNet152_in3 = Backbone_ResNet50_in3
    sys.modules.setdefault("resnet", mod)


_install_resnet_stub()


def test_lasnet_parity(rng):
    from core.LASNet import LASNet as RefLASNet

    from paif_tpu.models.zoo.seg_zoo import LASNet

    torch.manual_seed(0)
    ref = RefLASNet(9).eval()

    depth = rng.uniform(0, 1, (1, 1, 64, 64)).astype(np.float32)
    rgb = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(depth), torch.from_numpy(rgb)).numpy()

    model = LASNet(n_classes=9)
    jd = jnp.asarray(depth.transpose(0, 2, 3, 1))
    jr = jnp.asarray(rgb.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jd, jr)
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"]))
    sd = ref.state_dict()

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

    # backbone (shared across modalities): layer1_rgb = [conv1,bn1],
    # layer2_rgb = [maxpool, layer1], layer3/4/5 = layer2/3/4
    conv(("backbone", "conv1"), "layer1_rgb.0")
    bn(("backbone", "bn1"), "layer1_rgb.1")
    stage_tkeys = ["layer2_rgb.1", "layer3_rgb", "layer4_rgb", "layer5_rgb"]
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            f = ("backbone", f"layer{stage + 1}_{b}")
            t = f"{stage_tkeys[stage]}.{b}"
            for i in (1, 2, 3):
                conv(f + (f"conv{i}",), f"{t}.conv{i}")
                bn(f + (f"bn{i}",), f"{t}.bn{i}")
            if b == 0:
                conv(f + ("ds_conv",), f"{t}.downsample.0")
                bn(f + ("ds_bn",), f"{t}.downsample.1")

    def basic_ln(fpath, tkey):  # LASNet BasicConv2d: conv -> bn -> lrelu(0.1)
        conv(fpath + ("conv",), f"{tkey}.conv")
        bn(fpath + ("bn",), f"{tkey}.bn")

    for i in range(1, 6):
        basic_ln((f"rgbconv{i}",), f"rgbconv{i}")

    # CLM5
    for fcorr, tcorr in (("corr_x", "corr_x_2_x_ir"), ("corr_ir", "corr_ir_2_x_ir")):
        params[("CLM5", fcorr, "linear_e", "kernel")] = jnp.asarray(
            sd[f"CLM5.{tcorr}.linear_e.weight"].numpy().T
        )
        basic_ln(("CLM5", fcorr, "fusion"), f"CLM5.{tcorr}.fusion")
    basic_ln(("CLM5", "smooth1"), "CLM5.smooth1")
    basic_ln(("CLM5", "smooth2"), "CLM5.smooth2")
    basic_ln(("CLM5", "fusion"), "CLM5.fusion")
    conv(("CLM5", "pred"), "CLM5.pred", bias=True)

    # CAM4/3/2
    for name in ("CAM4", "CAM3", "CAM2"):
        basic_ln((name, "conv2"), f"{name}.conv2")
        conv((name, "sa_conv"), f"{name}.sa.conv1")
        params[(name, "cam", "gamma")] = jnp.asarray(sd[f"{name}.cam.gamma"].numpy())

    # ESM1
    basic_ln(("ESM1", "conv1"), "ESM1.conv1")
    basic_ln(("ESM1", "conv2"), "ESM1.conv2")
    for i in (1, 2, 3, 4):
        basic_ln(("ESM1", f"dconv{i}"), f"ESM1.dconv{i}")
    conv(("ESM1", "fuse_dconv"), "ESM1.fuse_dconv", bias=True)
    conv(("ESM1", "pred"), "ESM1.pred", bias=True)

    # decoder: my decoder3_a/_b, decoder2_a/_b, decoder1_a/_b/_c + pred
    basic_ln(("decoder3_a",), "decoder.decoder3.1")
    basic_ln(("decoder3_b",), "decoder.decoder3.2")
    basic_ln(("decoder2_a",), "decoder.decoder2.1")
    basic_ln(("decoder2_b",), "decoder.decoder2.2")
    basic_ln(("decoder1_a",), "decoder.decoder1.1")
    basic_ln(("decoder1_b",), "decoder.decoder1.2")
    basic_ln(("decoder1_c",), "decoder.decoder1.4")
    conv(("decoder1_pred",), "decoder.decoder1.5", bias=True)

    got = model.apply(
        {"params": unflatten_dict(params), "batch_stats": unflatten_dict(stats)}, jd, jr
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-3
    )
