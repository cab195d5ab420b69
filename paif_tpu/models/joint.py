"""Joint fusion + segmentation model.

Reference: Network_MM_Searched / Network_MM_CompModel
(core/model_fusion_auto.py:1029-1137, :698-806). Forward chain:
RGB->YCrCb, fuse luminances, recombine chroma, YCrCb->RGB, clip to [0,1],
min-max normalize, x255 + ImageNet per-channel normalize, SegFormer.

Differences by design:
  * min-max normalization is per-image (the reference reduces over the whole
    batch, which only matches itself at batch 1 — see ops.color).
  * any fusion module with signature (ir, vis_ycrcb, train) -> fused_y can be
    swapped in (the reference's CompModel role), enabling the baseline zoo.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.models.fusion_searched import FusionNetSearched
from paif_tpu.models.mit import mit
from paif_tpu.models.segformer_head import SegFormerHead
from paif_tpu.ops.color import (
    clip01,
    imagenet_normalize,
    minmax_normalize,
    recombine_chroma,
    rgb_to_ycrcb,
    ycrcb_to_rgb,
)


class SegFormer(nn.Module):
    """MiT encoder + all-MLP head (the reference's WeTr). Logits at stride 4."""

    backbone: str = "mit_b3"
    num_classes: int = 9
    embedding_dim: int = 256
    # Encoder block remat (PGD memory): False / True / tuple of stage indices
    # — see MixVisionTransformer.remat.
    remat: bool | Tuple[int, ...] = False

    def setup(self):
        self.encoder = mit(self.backbone, remat=self.remat)
        self.decoder = SegFormerHead(self.num_classes, self.embedding_dim)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.encoder(x, train=train)
        return self.decoder(feats, train=train)


class PAIFJoint(nn.Module):
    """fused_y, seg_logits = model(ir, vis_rgb).

    ir: (B,H,W,1|3) in [0,1] (channel 0 used); vis_rgb: (B,H,W,3) in [0,1].
    fused_y is the raw tanh-range fusion output; seg_logits are stride-4 NHWC.
    """

    backbone: str = "mit_b3"
    num_classes: int = 9
    embedding_dim: int = 256
    # Factory (not a Module instance: flax would adopt it under the field
    # name) so any fusion net can play the reference's CompModel role while
    # the submodule keeps the canonical name 'enhance_net'.
    fusion: Optional[Callable[[], nn.Module]] = None
    # Encoder block remat (PGD memory): False / True / tuple of stage indices.
    remat: bool | Tuple[int, ...] = False

    def setup(self):
        self.enhance_net = self.fusion() if self.fusion is not None else FusionNetSearched()
        self.denoise_net = SegFormer(
            self.backbone, self.num_classes, self.embedding_dim, remat=self.remat
        )

    def fuse(self, ir: jnp.ndarray, vis_rgb: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        vis_ycrcb = rgb_to_ycrcb(vis_rgb)
        return self.enhance_net(ir, vis_ycrcb, train)

    def seg_input(self, fused_y: jnp.ndarray, vis_rgb: jnp.ndarray) -> jnp.ndarray:
        """The normalization chain feeding the segmentation branch."""
        vis_ycrcb = rgb_to_ycrcb(vis_rgb)
        rgb = ycrcb_to_rgb(recombine_chroma(fused_y, vis_ycrcb))
        rgb = minmax_normalize(clip01(rgb), per_image=True)
        return imagenet_normalize(rgb)

    def __call__(
        self, ir: jnp.ndarray, vis_rgb: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        vis_ycrcb = rgb_to_ycrcb(vis_rgb)
        fused = self.enhance_net(ir, vis_ycrcb, train)
        rgb = ycrcb_to_rgb(recombine_chroma(fused, vis_ycrcb))
        rgb = minmax_normalize(clip01(rgb), per_image=True)
        seg = self.denoise_net(imagenet_normalize(rgb), train=train)
        return fused, seg
