"""ResNet-50 backbone parity: the flax backbone (models/zoo/resnet.py) vs a
plain-torch torchvision-v1.5-semantics implementation (torchvision itself is
not installed here; this reference reproduces its documented structure:
stride on the 3x3 conv, downsample 1x1+BN on the first block of each stage).
"""

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from paif_tpu.models.zoo.resnet import ResNet50Backbone


class TorchBottleneck(nn.Module):
    def __init__(self, in_ch, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or in_ch != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        self.relu = nn.ReLU()

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        layers = []
        in_ch, planes = 64, 64
        for stage, blocks in enumerate((3, 4, 6, 3)):
            stage_layers = []
            for b in range(blocks):
                stride = (1 if stage == 0 else 2) if b == 0 else 1
                stage_layers.append(TorchBottleneck(in_ch, planes, stride))
                in_ch = planes * 4
            layers.append(nn.Sequential(*stage_layers))
            planes *= 2
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        outs = []
        x = self.relu(self.bn1(self.conv1(x)))
        outs.append(x)
        x = self.maxpool(x)
        for stage in self.layers:
            x = stage(x)
            outs.append(x)
        return outs


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.2, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32)))


def test_resnet50_backbone_parity(rng):
    torch.manual_seed(0)
    ref = TorchResNet50().eval()
    with torch.no_grad():
        _randomize_bn_stats(ref, rng)

    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        wants = [o.numpy() for o in ref(torch.from_numpy(x))]

    model = ResNet50Backbone()
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jx)
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"]))
    sd = ref.state_dict()

    def conv(fpath, tkey):
        params[fpath + ("kernel",)] = jnp.asarray(np.transpose(sd[f"{tkey}.weight"].numpy(), (2, 3, 1, 0)))

    def bn(fpath, tkey):
        params[fpath + ("scale",)] = jnp.asarray(sd[f"{tkey}.weight"].numpy())
        params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())
        stats[fpath + ("mean",)] = jnp.asarray(sd[f"{tkey}.running_mean"].numpy())
        stats[fpath + ("var",)] = jnp.asarray(sd[f"{tkey}.running_var"].numpy())

    conv(("conv1",), "conv1")
    bn(("bn1",), "bn1")
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            f = (f"layer{stage + 1}_{b}",)
            t = f"layers.{stage}.{b}"
            for i in (1, 2, 3):
                conv(f + (f"conv{i}",), f"{t}.conv{i}")
                bn(f + (f"bn{i}",), f"{t}.bn{i}")
            if b == 0:
                conv(f + ("ds_conv",), f"{t}.downsample.0")
                bn(f + ("ds_bn",), f"{t}.downsample.1")

    outs = model.apply(
        {"params": unflatten_dict(params), "batch_stats": unflatten_dict(stats)}, jx
    )
    assert len(outs) == 5
    for i, (got, want) in enumerate(zip(outs, wants)):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-3,
            err_msg=f"stage {i}",
        )
