"""flax.linen building blocks (NHWC) for the fusion and segmentation branches."""

from paif_tpu.nn.layers import PReLU, BasicConv, Conv3x3, BatchNorm
from paif_tpu.nn.ops_registry import OPS, parse_op_string, make_op
from paif_tpu.nn.cells import (
    CellChain,
    CellDecom,
    SpatialAttnGate,
    CrossModalSpatialGate,
    ECALayer,
)

__all__ = [
    "PReLU",
    "BasicConv",
    "Conv3x3",
    "BatchNorm",
    "OPS",
    "parse_op_string",
    "make_op",
    "CellChain",
    "CellDecom",
    "SpatialAttnGate",
    "CrossModalSpatialGate",
    "ECALayer",
]
