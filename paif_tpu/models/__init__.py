"""Model zoo: the PAIF searched fusion net, SegFormer branch, joint wrappers,
and comparison baselines. All models are NHWC flax modules."""

from paif_tpu.models.fusion_searched import FusionNetSearched
from paif_tpu.models.mit import MixVisionTransformer, MIT_CONFIGS, mit
from paif_tpu.models.segformer_head import SegFormerHead
from paif_tpu.models.joint import SegFormer, PAIFJoint

__all__ = [
    "FusionNetSearched",
    "MixVisionTransformer",
    "MIT_CONFIGS",
    "mit",
    "SegFormerHead",
    "SegFormer",
    "PAIFJoint",
]
