"""Pure-function numerics substrate.

Every function here is a stateless jnp transform on NHWC arrays, designed to
be fused by XLA (with Pallas fast paths in paif_tpu.ops.pallas). These
reimplement, with documented reference semantics, the external-library
primitives the PyTorch reference leans on (guided_filter_pytorch, antialias
blur-pool, pytorch_ssim, torch F.interpolate / cross_entropy).
"""

from paif_tpu.ops.color import (
    rgb_to_ycrcb,
    ycrcb_to_rgb,
    recombine_chroma,
    clip01,
    minmax_normalize,
    imagenet_normalize,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from paif_tpu.ops.sobel import sobel_xy
from paif_tpu.ops.ssim import ssim, gaussian_window
from paif_tpu.ops.guided_filter import box_filter, guided_filter
from paif_tpu.ops.entropy import patch_entropy
from paif_tpu.ops.resize import resize_bilinear
from paif_tpu.ops.blurpool import blur_pool
from paif_tpu.ops.losses import (
    cross_entropy_ignore,
    softmax_cross_entropy_per_pixel,
)

__all__ = [
    "rgb_to_ycrcb",
    "ycrcb_to_rgb",
    "recombine_chroma",
    "clip01",
    "minmax_normalize",
    "imagenet_normalize",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "sobel_xy",
    "ssim",
    "gaussian_window",
    "box_filter",
    "guided_filter",
    "patch_entropy",
    "resize_bilinear",
    "blur_pool",
    "cross_entropy_ignore",
    "softmax_cross_entropy_per_pixel",
]
