"""ResNet-50 backbone (torchvision v1.5 semantics), NHWC flax.

The reference seg zoo imports a local `resnet` module providing
Backbone_ResNet50_in3 — a file ABSENT from the reference repo
(core/LASNet.py:4, core/EGFNet.py:5); the conventional implementation splits
torchvision resnet50 into 5 stages:
  div_2:  conv1(7x7/2) + bn + relu
  div_4:  maxpool(3x3/2) + layer1 (256ch)
  div_8:  layer2 (512ch)
  div_16: layer3 (1024ch)
  div_32: layer4 (2048ch)
Bottleneck stride sits on the 3x3 conv (torchvision v1.5).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import get_precision, BatchNorm


def _conv(features, kernel, stride=1, name=None):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        precision=get_precision(),
        name=name,
    )


class Bottleneck(nn.Module):
    planes: int  # inner width; output = planes * 4
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = nn.relu(BatchNorm(name="bn1")(out, use_running_average=not train))
        out = _conv(self.planes, 3, self.stride, name="conv2")(out)
        out = nn.relu(BatchNorm(name="bn2")(out, use_running_average=not train))
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, use_running_average=not train)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, name="ds_conv")(x)
            identity = BatchNorm(name="ds_bn")(identity, use_running_average=not train)
        return nn.relu(out + identity)


class ResNet50Backbone(nn.Module):
    """Returns the 5-stage pyramid [div2(64), div4(256), div8(512),
    div16(1024), div32(2048)] for an NHWC input."""

    in_channels: int = 3
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        outs = []
        x = _conv(64, 7, 2, name="conv1")(x)
        x = nn.relu(BatchNorm(name="bn1")(x, use_running_average=not train))
        outs.append(x)  # div 2, 64ch
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        planes = 64
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            outs.append(x)
            planes *= 2
        return outs
