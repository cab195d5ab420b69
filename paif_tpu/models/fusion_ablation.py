"""Ablation fusion networks from the reference (model_fusion_auto.py).

  * FusionNetworkDRDB      <- Fusion_Network (:159-188): concat stem + 2 DRDBs
  * FusionNetworkSKFF      <- Fusion_Network2 (:227-260): + SKFF skip injection
  * TwoStreamFusion        <- Fusion_Network_auto/_Add/_Average/_Max/_SPA/
                              _Direct (:1191-1444): two per-modality cell
                              chains + an aggregation strategy + a refinement
                              chain, parameterized by `aggregate`
  * FusionNetSearchedShow  <- Network_Fusion_Searched_showfeatures (:643-695)
                              / Cell_Decom_decom (:538-581): searched net
                              returning intermediate LF/HF/residue/gate maps
                              for visualization.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.genotype import Genotype, PAIF_GENOTYPE
from paif_tpu.nn.cells import CellChain, CrossModalSpatialGate, decompose
from paif_tpu.nn.layers import Conv, PReLU
from paif_tpu.nn.support import DRDB, SKFF
from paif_tpu.ops.color import clip01, minmax_normalize


def _clip_minmax(x: jnp.ndarray) -> jnp.ndarray:
    """clip [0,1] then min-max normalize (per-image; reference uses the whole
    tensor at batch 1 — see ops.color.minmax_normalize)."""
    return minmax_normalize(clip01(x), per_image=True)


class FusionNetworkDRDB(nn.Module):
    """Fusion_Network: 2-ch concat stem -> 2 DRDBs -> 64->32->1 head."""

    @nn.compact
    def __call__(self, ir, vis, train: bool = False):
        x = jnp.concatenate([ir[..., 0:1], vis[..., 0:1]], axis=-1)
        prelu = PReLU(name="act")
        x = prelu(Conv(64, 3, use_bias=True, name="conv1")(x))
        x = DRDB(64, name="drdb1")(x, train)
        x = DRDB(64, name="drdb2")(x, train)
        x = prelu(Conv(32, 3, use_bias=True, name="conv2")(x))
        x = prelu(Conv(1, 3, use_bias=True, name="conv21")(x))
        return _clip_minmax(x)


class FusionNetworkSKFF(nn.Module):
    """Fusion_Network2: DRDB trunk with SKFF injections of external features
    out1/out2 (e.g. seg-branch pyramid levels projected to 64ch)."""

    @nn.compact
    def __call__(self, ir, vis, out1, out2, train: bool = False):
        x = jnp.concatenate([ir[..., 0:1], vis[..., 0:1]], axis=-1)
        prelu = PReLU(name="act")
        x = prelu(Conv(64, 3, use_bias=True, name="conv1")(x))
        f1 = DRDB(64, name="drdb1")(x, train)
        f1 = SKFF(height=2, name="skff")([f1, Conv(64, 1, use_bias=True, name="conv3")(out1)], train)
        f2 = DRDB(64, name="drdb2")(f1, train)
        f2 = SKFF(height=2, name="skff2")([f2, Conv(64, 1, use_bias=True, name="conv4")(out2)], train)
        f = prelu(Conv(1, 3, use_bias=True, name="conv2")(f2))
        return minmax_normalize(f, per_image=True)


class TwoStreamFusion(nn.Module):
    """The aggregation-strategy ablation family (model_fusion_auto.py
    :1191-1444): per-modality stems + cell chains, aggregate in
    {'concat','add','average','max','spa','direct'}, refinement chain,
    64->32->1 head, clamp [0,1], whole-tensor min-max.

    Reference fidelity notes:
      * head: tanh(conv21) for 'concat' (Fusion_Network_auto) and 'direct';
        PReLU(conv21) for 'average'/'max'/'spa' (set by `aggregate`).
      * 'spa' mixes with the CROSS-modal gate (spatial_attn_layer_M over the
        4-channel (max,mean) pools of both streams): scale*ir + (1-scale)*vis.
      * 'direct' is single-stream: conv1 takes the 2-channel concat
        (Fusion_Network_Direct :1415-1444) and there is no vis stem/chain.
      * 'add' (Fusion_Network_Add :1232) is dead upstream — it instantiates
        an undefined Cell_Chain2; our 'add' runs the live Cell_Chain. See
        PARITY.md deliberate omissions.
    """

    aggregate: str = "concat"
    features: int = 64
    chain_ops: Tuple[str, ...] = ("Denseblocks_3_1", "Denseblocks_3_1")

    @nn.compact
    def __call__(self, ir, vis, train: bool = False):
        c = self.features
        prelu = PReLU(name="act")
        if self.aggregate == "direct":
            x = jnp.concatenate([ir[..., 0:1], vis[..., 0:1]], axis=-1)
            fir = prelu(Conv(c, 3, use_bias=True, name="conv1")(x))
            agg = CellChain(c, self.chain_ops, name="chain_ir")(fir, train)
        else:
            fir = prelu(Conv(c, 3, use_bias=True, name="conv1")(ir[..., 0:1]))
            fvis = prelu(Conv(c, 3, use_bias=True, name="conv12")(vis[..., 0:1]))
            fir = CellChain(c, self.chain_ops, name="chain_ir")(fir, train)
            fvis = CellChain(c, self.chain_ops, name="chain_vis")(fvis, train)

            if self.aggregate == "concat":
                agg = Conv(c, 3, use_bias=True, name="conv_concat")(
                    jnp.concatenate([fir, fvis], axis=-1)
                )
            elif self.aggregate == "add":
                agg = fir + fvis
            elif self.aggregate == "average":
                agg = (fir + fvis) / 2.0
            elif self.aggregate == "max":
                agg = jnp.maximum(fir, fvis)
            elif self.aggregate == "spa":
                scale = CrossModalSpatialGate(name="spa")(fir, fvis, train)
                agg = scale * fir + (1.0 - scale) * fvis
            else:
                raise ValueError(self.aggregate)

        agg = CellChain(c, self.chain_ops, name="chain_agg")(agg, train)
        f = prelu(Conv(c // 2, 3, use_bias=True, name="conv2")(agg))
        f = Conv(1, 3, use_bias=True, name="conv21")(f)
        tanh_head = self.aggregate in ("concat", "add", "direct")
        f = jnp.tanh(f) if tanh_head else prelu(f)
        return _clip_minmax(f)


class FusionNetSearchedShow(nn.Module):
    """The searched fusion net returning visualization intermediates:
    (fused, dict(lf_ir, hf_ir, res_ir, lf_vis, hf_vis, res_vis, gate)).
    Parameter tree identical to FusionNetSearched so the same checkpoint
    loads (reference pattern: Cell_Decom_decom shares Cell_Decom weights).
    """

    features: int = 32
    genotype: Genotype = PAIF_GENOTYPE

    @nn.compact
    def __call__(self, ir, vis, train: bool = False):
        from paif_tpu.nn.cells import CellDecom, residue

        c = self.features
        g = self.genotype
        ir = ir[..., 0:1]
        vis = vis[..., 0:1]
        fir = PReLU(name="stem_1_act")(Conv(c, 3, name="stem_1")(ir))
        fvis = PReLU(name="stem_2_act")(Conv(c, 3, name="stem_2")(vis))

        # intermediates recomputed outside the cell (pure functions)
        lf_ir, hf_ir = decompose(fir)
        lf_vis, hf_vis = decompose(fvis)
        res_ir, res_vis = residue(fir), residue(fvis)

        ir_feat, vis_feat = CellDecom(
            c, g.ops("normal_1"), g.ops("normal_2"), name="decompation"
        )(fir, fvis, train)
        gate = CrossModalSpatialGate(name="spa")(ir_feat, vis_feat, train)
        agg = gate * ir_feat + (1.0 - gate) * vis_feat
        refined = CellChain(c, g.ops("normal_3"), name="chain")(agg, train)
        out = Conv(c // 2, 3, name="stem_out_0")(refined)
        out = Conv(1, 3, name="stem_out_1")(out)
        out = jnp.tanh(PReLU(name="stem_out_act")(out))
        intermediates = {
            "lf_ir": lf_ir,
            "hf_ir": hf_ir,
            "res_ir": res_ir,
            "lf_vis": lf_vis,
            "hf_vis": hf_vis,
            "res_vis": res_vis,
            "gate": gate,
        }
        return out, intermediates
