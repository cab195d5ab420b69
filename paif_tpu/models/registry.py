"""Model registries: fusion zoo + segmentation zoo constructors by name."""

from __future__ import annotations

from typing import Callable, Dict

from flax import linen as nn

from paif_tpu.genotype import PAIF_GENOTYPE
from paif_tpu.models.fusion_searched import FusionNetSearched
from paif_tpu.models.fusion_ablation import (
    FusionNetworkDRDB,
    TwoStreamFusion,
)
from paif_tpu.models.zoo.bffusion import BFFR
from paif_tpu.models.zoo.fusion_zoo import (
    DID,
    FusionAdd,
    FusionAverage,
    FusionMax,
    ReCoNet,
    SDNet,
    SeaFusion,
    U2Fusion,
)

FUSION_ZOO: Dict[str, Callable[[], nn.Module]] = {
    "searched": lambda: FusionNetSearched(32, PAIF_GENOTYPE),
    "u2fusion": U2Fusion,
    "seafusion": SeaFusion,
    "sdnet": SDNet,
    "reconet": ReCoNet,
    "did": DID,  # AUIF
    "bffusion": BFFR,
    "drdb": FusionNetworkDRDB,
    "auto_concat": lambda: TwoStreamFusion(aggregate="concat"),
    "auto_add": lambda: TwoStreamFusion(aggregate="add"),
    "auto_average": lambda: TwoStreamFusion(aggregate="average"),
    "auto_max": lambda: TwoStreamFusion(aggregate="max"),
    "auto_spa": lambda: TwoStreamFusion(aggregate="spa"),
    "auto_direct": lambda: TwoStreamFusion(aggregate="direct"),
    "add": FusionAdd,
    "average": FusionAverage,
    "max": FusionMax,
}


def register_fusion(name: str, ctor: Callable[[], nn.Module]) -> None:
    FUSION_ZOO[name] = ctor


def _seg_zoo():
    from paif_tpu.models.zoo.seg_zoo import EGFNet, GMNet, LASNet

    return {"gmnet": GMNet, "lasnet": LASNet, "egfnet": EGFNet}


def seg_zoo() -> Dict[str, Callable[[], nn.Module]]:
    """RGB-T segmentation comparison nets (lazy import — heavier modules)."""
    return _seg_zoo()
