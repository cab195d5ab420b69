"""MFNet 9-class palette and prediction colorization (util/util.py:8-29)."""

from __future__ import annotations

import numpy as np

# 0:unlabeled 1:car 2:person 3:bike 4:curve 5:car_stop 6:guardrail
# 7:color_cone 8:bump
MFNET_PALETTE = np.array(
    [
        [0, 0, 0],
        [64, 0, 128],
        [64, 64, 0],
        [0, 128, 192],
        [0, 0, 192],
        [128, 128, 0],
        [64, 64, 128],
        [192, 128, 128],
        [192, 64, 0],
    ],
    dtype=np.uint8,
)

CLASS_NAMES = (
    "unlabeled",
    "car",
    "person",
    "bike",
    "curve",
    "car_stop",
    "guardrail",
    "color_cone",
    "bump",
)


def get_palette() -> np.ndarray:
    return MFNET_PALETTE


def colorize(pred: np.ndarray) -> np.ndarray:
    """(H,W) int class map -> (H,W,3) uint8 RGB. Classes >8 render black."""
    pred = np.asarray(pred)
    safe = np.where((pred >= 0) & (pred < len(MFNET_PALETTE)), pred, 0)
    img = MFNET_PALETTE[safe]
    img[(pred < 0) | (pred >= len(MFNET_PALETTE))] = 0
    return img
