"""Evaluation: device-side confusion matrices, reference-parity metrics,
palette visualization, and batched eval harnesses."""

from paif_tpu.eval.metrics import (
    confusion_matrix,
    compute_results,
    scores,
    summarize,
)
from paif_tpu.eval.palette import MFNET_PALETTE, get_palette, colorize

__all__ = [
    "confusion_matrix",
    "compute_results",
    "scores",
    "summarize",
    "MFNET_PALETTE",
    "get_palette",
    "colorize",
]
