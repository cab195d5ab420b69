"""SegFormer all-MLP decode head, NHWC.

Reference: core/segformer_head.py — per-scale linear embedding to 256,
bilinear upsample of C2..C4 to the C1 grid (align_corners=False), concat in
the order [c4, c3, c2, c1], a 1x1 ConvModule (conv, no bias -> BN -> ReLU),
Dropout2d(0.1), and a 1x1 class predictor. Output logits are at stride 4.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import get_precision, BatchNorm
from paif_tpu.ops.resize import resize_bilinear


class SegFormerHead(nn.Module):
    num_classes: int = 9
    embedding_dim: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        c1 = feats[0]
        target_hw = c1.shape[1:3]
        embeds = []
        # reference order: _c4, _c3, _c2, _c1 (segformer_head.py:66-77)
        for idx in (3, 2, 1, 0):
            f = feats[idx]
            e = nn.Dense(
                self.embedding_dim, precision=get_precision(), name=f"linear_c{idx + 1}"
            )(f)
            if idx != 0:
                e = resize_bilinear(e, target_hw, align_corners=False)
            embeds.append(e)
        x = jnp.concatenate(embeds, axis=-1)
        x = nn.Conv(
            self.embedding_dim,
            kernel_size=(1, 1),
            use_bias=False,
            precision=get_precision(),
            name="linear_fuse",
        )(x)
        x = BatchNorm(name="fuse_norm")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(
            self.num_classes,
            kernel_size=(1, 1),
            use_bias=True,
            precision=get_precision(),
            name="linear_pred",
        )(x)
