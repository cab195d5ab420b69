"""Synthetic IR/visible/label fixtures.

Generates structured scenes (gradient background, bright 'thermal' blobs,
class-shaped rectangles) so fusion and segmentation have real signal to chew
on in tests and benchmarks without the MFNet download.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def synthesize_pair(
    rng: np.random.Generator, hw: Tuple[int, int] = (480, 640), num_classes: int = 9
):
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    vis = np.stack(
        [
            0.3 + 0.4 * xx / w,
            0.3 + 0.4 * yy / h,
            0.5 + 0.2 * np.sin(xx / 23.0),
        ],
        axis=-1,
    )
    ir = 0.2 + 0.1 * (yy / h)
    label = np.zeros((h, w), dtype=np.int64)
    for _ in range(6):
        cls = int(rng.integers(1, num_classes))
        bh, bw = int(rng.integers(h // 10, h // 3)), int(rng.integers(w // 10, w // 3))
        y0, x0 = int(rng.integers(0, h - bh)), int(rng.integers(0, w - bw))
        label[y0 : y0 + bh, x0 : x0 + bw] = cls
        ir[y0 : y0 + bh, x0 : x0 + bw] += 0.5 * rng.uniform(0.5, 1.0)
        vis[y0 : y0 + bh, x0 : x0 + bw, :] *= rng.uniform(0.6, 1.4)
    vis = np.clip(vis + rng.normal(0, 0.02, vis.shape), 0, 1).astype(np.float32)
    ir = np.clip(ir + rng.normal(0, 0.02, ir.shape), 0, 1).astype(np.float32)[..., None]
    return vis, ir, label


class SyntheticFusionDataset:
    """In-memory (vis, ir, label, name) dataset of synthetic scenes."""

    def __init__(self, n: int = 8, hw: Tuple[int, int] = (480, 640), seed: int = 0):
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            vis, ir, label = synthesize_pair(rng, hw)
            self.items.append((vis, ir, label, f"{i:05d}.png"))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def make_synthetic_dataset(
    out_dir: Optional[str] = None,
    n: int = 8,
    hw: Tuple[int, int] = (480, 640),
    seed: int = 0,
):
    """In-memory dataset, optionally also written to out_dir/{Visible,
    Infrared,Label} PNGs in the reference's directory layout."""
    ds = SyntheticFusionDataset(n, hw, seed)
    if out_dir is not None:
        for sub in ("Visible", "Infrared", "Label"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        for vis, ir, label, name in ds.items:
            Image.fromarray((vis * 255).astype(np.uint8)).save(
                os.path.join(out_dir, "Visible", name)
            )
            Image.fromarray((ir[..., 0] * 255).astype(np.uint8)).save(
                os.path.join(out_dir, "Infrared", name)
            )
            Image.fromarray(label.astype(np.uint8)).save(os.path.join(out_dir, "Label", name))
    return ds
