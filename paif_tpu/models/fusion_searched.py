"""The PAIF NAS-searched infrared/visible fusion network.

Reference: Network_Fusion_Searched (core/model_fusion_auto.py:599-640).
Structure: per-modality 1->C stems (3x3 conv + PReLU), a guided-filter
decomposition cell running genotype chains normal_1/normal_2, a cross-modal
spatial gate mixing the two streams, the normal_3 refinement chain, and an
output head C -> C/2 -> 1 (3x3 convs, PReLU after the LAST conv) into tanh.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.genotype import Genotype, PAIF_GENOTYPE
from paif_tpu.nn.cells import CellChain, CellDecom, CrossModalSpatialGate
from paif_tpu.nn.layers import Conv, PReLU


class FusionNetSearched(nn.Module):
    """Inputs: ir (B,H,W,>=1), vis_y (B,H,W,>=1) — channel 0 of each is used.

    Returns the fused luminance (B,H,W,1) in tanh range.

    TPU layout: when PAIF_PACKED is on (default) and H,W are even, the whole
    body runs on a 2x2 space-to-depth packing — C=32 becomes 128 packed
    channels, exactly one lane tile, removing the 4x lane-padding tax on
    every conv and elementwise op (see ops/packed.py). Parameter tree and
    outputs are identical to the plain layout up to f32 summation order.
    """

    features: int = 32
    genotype: Genotype = PAIF_GENOTYPE
    # Lean-memory guided-filter gradients (jax.checkpoint over the split):
    # set by memory-tight differentiating callers (robust eval / AAT train).
    remat_filter: bool = False

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from paif_tpu.ops.packed import (
            is_packed,
            pack,
            packed_enabled,
            packed_mode,
            tile_gate_packed,
            unpack,
        )

        c = self.features
        g = self.genotype
        already_packed = is_packed()
        if already_packed:
            # nested in a caller's packed context: channel 0 = first 4
            # packed channels (c-major/phase-minor)
            ir = ir[..., 0:4]
            vis = vis[..., 0:4]
            use_packed = False
        else:
            ir = ir[..., 0:1]
            vis = vis[..., 0:1]
            use_packed = (
                packed_enabled() and ir.shape[1] % 2 == 0 and ir.shape[2] % 2 == 0
            )
            if use_packed:
                ir, vis = pack(ir), pack(vis)

        with packed_mode(use_packed or already_packed):
            fir = PReLU(name="stem_1_act")(Conv(c, 3, name="stem_1")(ir))
            fvis = PReLU(name="stem_2_act")(Conv(c, 3, name="stem_2")(vis))

            ir_feat, vis_feat = CellDecom(
                c,
                g.ops("normal_1"),
                g.ops("normal_2"),
                remat_filter=self.remat_filter,
                name="decompation",
            )(fir, fvis, train)

            scale = CrossModalSpatialGate(name="spa")(ir_feat, vis_feat, train)
            if is_packed():
                scale = tile_gate_packed(scale, c)
            aggregated = scale * ir_feat + (1.0 - scale) * vis_feat

            refined = CellChain(c, g.ops("normal_3"), name="chain")(aggregated, train)

            out = Conv(c // 2, 3, name="stem_out_0")(refined)
            out = Conv(1, 3, name="stem_out_1")(out)
            out = PReLU(name="stem_out_act")(out)

        if use_packed:
            out = unpack(out)
        return jnp.tanh(out)
