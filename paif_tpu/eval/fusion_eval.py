"""Fusion-only evaluation + feature/attention visualization.

Reference: test_original.py val_fusion_model (:483-545) — run the fusion net
over clean or pre-attacked image dirs and save recombined fused RGB PNGs —
and val_fusion_train / visulize_spatial_attention (:548-700) — dump the
decomposition intermediates (features, LF/HF, residues, gate) as
coolwarm-colormapped channel-max heatmaps.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from paif_tpu.data.pipeline import PrefetchLoader, batch_iterator
from paif_tpu.eval.harness import fused_to_uint8


def run_fusion_eval(
    fusion_apply,
    variables,
    dataset,
    save_dir: str,
    batch_size: int = 8,
) -> int:
    """Save fused RGB images for every (vis, ir, ...) item. Returns count.

    fusion_apply(variables, ir, vis_ycrcb) -> fused_y; inputs NHWC [0,1].
    """
    from PIL import Image

    import jax.numpy as jnp

    from paif_tpu.ops.color import rgb_to_ycrcb

    os.makedirs(save_dir, exist_ok=True)

    @jax.jit
    def step(variables, ir, vis):
        fused = fusion_apply(variables, ir, rgb_to_ycrcb(vis))
        return fused_to_uint8(fused, vis)

    n = 0
    loader = PrefetchLoader(lambda: batch_iterator(dataset, batch_size))
    for batch in loader:
        out = np.asarray(
            step(variables, jnp.asarray(batch["ir"]), jnp.asarray(batch["vis"]))
        )
        for k, name in enumerate(batch["name"]):
            if not batch["valid"][k]:
                continue
            Image.fromarray(out[k]).save(os.path.join(save_dir, name))
            n += 1
    return n


def save_attention_heatmap(mask2d: np.ndarray, path: str, cmap: str = "coolwarm") -> None:
    """visulize_spatial_attention parity (test_original.py:668-700):
    max-normalize and save a colormapped heatmap."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    normed = mask2d / max(float(mask2d.max()), 1e-12)
    plt.xticks([])
    plt.yticks([])
    plt.axis("off")
    plt.margins(0, 0)
    plt.imshow((normed * 255).astype("uint8"), alpha=1, interpolation="nearest", cmap=cmap)
    plt.savefig(path, bbox_inches="tight", pad_inches=0.0)
    plt.clf()


def dump_fusion_features(
    show_model,
    variables,
    ir: np.ndarray,
    vis: np.ndarray,
    out_dir: str,
    name: str = "sample",
) -> Dict[str, str]:
    """val_fusion_train equivalent: run the show-features fusion net on one
    (ir, vis) pair, save the fused image plus channel-max heatmaps of every
    intermediate. Returns {intermediate_name: file path}."""
    from PIL import Image

    import jax.numpy as jnp

    from paif_tpu.ops.color import rgb_to_ycrcb

    stem = os.path.join(out_dir, os.path.splitext(name)[0])
    os.makedirs(stem, exist_ok=True)
    jir = jnp.asarray(ir[None] if ir.ndim == 3 else ir)
    jvis = jnp.asarray(vis[None] if vis.ndim == 3 else vis)
    fused, inter = show_model.apply(variables, jir, rgb_to_ycrcb(jvis))
    u8 = np.asarray(fused_to_uint8(fused, jvis))[0]
    paths = {}
    fused_path = os.path.join(stem, name)
    Image.fromarray(u8).save(fused_path)
    paths["fused"] = fused_path
    for idx, (key, val) in enumerate(inter.items()):
        arr = np.asarray(val)[0]
        heat = arr.max(axis=-1)
        p = os.path.join(stem, f"{idx}_{key}.png")
        save_attention_heatmap(heat, p)
        paths[key] = p
    return paths
