"""Fusion cells: sequential op chains and the guided-filter decomposition cell.

Reference semantics: core/model_fusion_auto.py
  * Cell_Chain (:418-445): ops applied sequentially with an outer residual.
  * Cell_Decom (:492-535): per-modality guided-filter low/high-frequency
    decomposition at radius 4 with eps {1e-3, 1e-4}, 1x1 recombination, two
    genotype chains, residual outputs.
  * spatial_attn_layer_M (:1352-1368): cross-modal spatial gate from
    (max,mean) channel pools of both modalities.

Reference quirk preserved: the lf branch concatenates (lf_ir, hf_ir) and the
hf branch (lf_vis, hf_vis) — a per-modality split rather than a per-frequency
one (model_fusion_auto.py:512-513). The published weights were trained this
way.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import BasicConv, Conv, channel_pool
from paif_tpu.nn.ops_registry import make_op
from paif_tpu.ops.guided_filter import guided_filter_multi_eps

# Re-export the plain single-input gate for SPA-style fusion variants.
from paif_tpu.nn.ops_registry import SpatialAttnLayer as SpatialAttnGate  # noqa: F401


class CellChain(nn.Module):
    """Sequential genotype ops with an outer residual: x + opN(...op1(x))."""

    features: int
    ops: Tuple[str, ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = x
        for i, primitive in enumerate(self.ops):
            s = make_op(self.features, primitive, name=f"op{i}")(s, train)
        return x + s


def residue(x: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel channel max - min -> (B,H,W,1). model_fusion_auto.py:517-521.

    Packed-layout aware: on (B,H',W',4C) input the reduction runs per phase
    and returns the packed 1-channel residue (B,H',W',4)."""
    from paif_tpu.ops.packed import channel_reduce_packed, is_packed

    if is_packed():
        return channel_reduce_packed(x, jnp.max) - channel_reduce_packed(x, jnp.min)
    return (jnp.max(x, axis=-1) - jnp.min(x, axis=-1))[..., None]


def decompose(
    x: jnp.ndarray,
    radius: int = 4,
    eps_list: Tuple[float, ...] = (1e-3, 1e-4),
    remat: bool = False,
):
    """Guided-filter frequency split. Returns (LF, HF), each C*len(eps_list).

    The guide is the channel residue; each eps produces one (LF, x-LF) pair,
    concatenated along channels (model_fusion_auto.py:522-535).

    Memory under differentiation: the guided filter's analytic custom VJP
    (ops/guided_filter.py) saves only the window moments (backward = 6 box
    sums, no recompute) — the fast default. remat=True additionally wraps
    the split in jax.checkpoint so only the INPUT survives to the backward
    (the moments are recomputed): ~2% slower per attack step but needed by
    the memory-tight eval/train paths (robust CLI at 480x640 batch 8 holds
    the eval step's extra outputs and OOMs with the moment residuals)."""

    def _split(t):
        guide = residue(t)
        # One fused call: the window moments are eps-independent, so the
        # two-eps split shares them (6 C-channel box passes instead of 8).
        lfs = guided_filter_multi_eps(guide, t, radius, eps_list)
        hfs = [t - lf for lf in lfs]
        return jnp.concatenate(lfs, axis=-1), jnp.concatenate(hfs, axis=-1)

    if remat:
        import jax

        _split = jax.checkpoint(_split)
    return _split(x)


class CellDecom(nn.Module):
    """Decomposition cell over an (ir, vis) feature pair."""

    features: int
    chain1_ops: Tuple[str, ...]  # genotype normal_1
    chain2_ops: Tuple[str, ...]  # genotype normal_2
    radius: int = 4
    eps_list: Tuple[float, ...] = (1e-3, 1e-4)
    remat_filter: bool = False  # lean-memory guided-filter gradients

    @nn.compact
    def __call__(
        self, inp_ir: jnp.ndarray, inp_vis: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        import os

        c = self.features
        if os.environ.get("PAIF_DECOM_STACK", "0") not in ("0", "off"):
            # Batch-stack the two independent per-modality decompositions:
            # one guided-filter call at 2B instead of two at B. Bit-identical
            # per-sample, and halves the per-box fixed overheads — but a
            # measured e2e NEGATIVE on v5e: fusion fwd B16 210.8 ms stacked
            # vs 122.2 split (scripts/bench_fusion_ab.py, 2026-08-17); the
            # 2B-wide box intermediates lose more to scheduling than the
            # halved pass count saves. Default OFF; opt in to re-measure.
            b = inp_ir.shape[0]
            lf_s, hf_s = decompose(
                jnp.concatenate([inp_ir, inp_vis], axis=0),
                self.radius,
                self.eps_list,
                self.remat_filter,
            )
            lf_ir, hf_ir = lf_s[:b], hf_s[:b]
            lf_vis, hf_vis = lf_s[b:], hf_s[b:]
        else:
            lf_ir, hf_ir = decompose(inp_ir, self.radius, self.eps_list, self.remat_filter)
            lf_vis, hf_vis = decompose(inp_vis, self.radius, self.eps_list, self.remat_filter)
        lf = Conv(c, 1, use_bias=True, name="conv1x1_lf")(jnp.concatenate([lf_ir, hf_ir], -1))
        hf = Conv(c, 1, use_bias=True, name="conv1x1_hf")(jnp.concatenate([lf_vis, hf_vis], -1))
        lf_re = CellChain(c, self.chain1_ops, name="chain")(lf, train)
        hf_re = CellChain(c, self.chain2_ops, name="chain2")(hf, train)
        return lf_re + inp_ir, hf_re + inp_vis


class CrossModalSpatialGate(nn.Module):
    """scale in (0,1): conv over (max_ir, mean_ir, max_vis, mean_vis) pools."""

    kernel_size: int = 5

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pooled = jnp.concatenate([channel_pool(ir), channel_pool(vis)], axis=-1)
        gate = BasicConv(1, self.kernel_size, relu=False, name="spatial")(pooled, train)
        return nn.sigmoid(gate)


# ECALayer re-export for package-level convenience.
from paif_tpu.nn.ops_registry import ECALayer  # noqa: E402,F401
