"""Training losses: the fusion-loss family and segmentation losses."""

from paif_tpu.losses.fusion import (
    fusion_loss,
    fusion_loss2,
    fusion_loss3,
    fusion_loss4,
    fusion_loss6,
    fusion_loss_add,
    fusion_loss_grad,
    fusion_loss_grad2,
    fusion_loss_grad3,
    new_loss_sobel,
    total_fusion_loss,
    total_fusion_loss2,
    total_fusion_loss3,
    iqa_loss,
    laplacian_pyramid_loss,
    FUSION_LOSSES,
)
from paif_tpu.losses.detection import (
    fcos_loss,
    gen_targets,
    focal_loss_from_logits,
    iou_loss_elems,
    giou_loss_elems,
)
from paif_tpu.losses.seg import (
    ohem_ce_loss,
    softmax_focal_loss,
    normal_loss,
)

__all__ = [
    "fusion_loss",
    "fusion_loss2",
    "fusion_loss3",
    "fusion_loss4",
    "fusion_loss6",
    "fusion_loss_add",
    "fusion_loss_grad",
    "fusion_loss_grad2",
    "fusion_loss_grad3",
    "new_loss_sobel",
    "total_fusion_loss",
    "total_fusion_loss2",
    "total_fusion_loss3",
    "iqa_loss",
    "laplacian_pyramid_loss",
    "FUSION_LOSSES",
    "fcos_loss",
    "gen_targets",
    "focal_loss_from_logits",
    "iou_loss_elems",
    "giou_loss_elems",
    "ohem_ce_loss",
    "softmax_focal_loss",
    "normal_loss",
]
