"""One dataclass config tree serialized as YAML with CLI dot-overrides.

Replaces the reference's split argparse + OmegaConf + hardcoded literals
(robust_test.py:27-48, genotype literal :253-257, dataset paths :100-102).
The genotype is part of the config, round-tripping the reference's namedtuple
schema (see paif_tpu.genotype).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml

from paif_tpu.genotype import Genotype, PAIF_GENOTYPE


@dataclass
class ModelConfig:
    backbone: str = "mit_b3"
    num_classes: int = 9
    embedding_dim: int = 256
    fusion_channels: int = 32
    genotype: Genotype = PAIF_GENOTYPE
    fusion_model: str = "searched"  # key into the fusion zoo registry


@dataclass
class DataConfig:
    ir_path: Optional[str] = None
    vi_path: Optional[str] = None
    label_path: Optional[str] = None
    batch_size: int = 8
    image_hw: tuple = (480, 640)
    synthetic: bool = False  # use generated fixtures instead of disk data
    synthetic_n: int = 8


@dataclass
class AttackCLIConfig:
    epsilon: float = 8.0 / 255.0
    alpha: float = 2.0 / 255.0
    attack_iters: int = 5
    attack_loss: str = "l_seg"
    attack_way: str = "PGD"
    attack_mode: str = "both"
    restarts: int = 1


@dataclass
class TrainCLIConfig:
    learning_rate: float = 8e-5
    weight_decay: float = 0.01
    warmup_iter: int = 3000
    warmup_ratio: float = 1e-5
    power: float = 1.0
    max_iters: int = 160000
    crop_size: int = 360
    fusion_weight: float = 0.1
    seg_weight: float = 4.0
    fusion_loss: str = "grad2"


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DataConfig = field(default_factory=DataConfig)
    attack: AttackCLIConfig = field(default_factory=AttackCLIConfig)
    train: TrainCLIConfig = field(default_factory=TrainCLIConfig)
    checkpoint: Optional[str] = None
    save_dir: Optional[str] = None
    strategy: str = "meta_final"
    seed: int = 0
    dtype: str = "float32"  # float32 | bfloat16 (params cast for perf runs)


def _update_dataclass(obj: Any, data: Dict[str, Any]) -> Any:
    for k, v in data.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key '{k}' on {type(obj).__name__}")
        cur = getattr(obj, k)
        if isinstance(cur, Genotype) and isinstance(v, dict):
            setattr(obj, k, Genotype.from_dict(v))  # frozen: replace, not recurse
        elif dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _update_dataclass(cur, v)
        else:
            setattr(obj, k, v)
    return obj


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load YAML into the Config tree; `overrides` maps dotted keys to values
    (e.g. {'attack.attack_iters': 10})."""
    cfg = Config()
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        _update_dataclass(cfg, data)
    for dotted, v in (overrides or {}).items():
        obj = cfg
        *parents, leaf = dotted.split(".")
        for p in parents:
            obj = getattr(obj, p)
        if not hasattr(obj, leaf):
            raise KeyError(f"unknown override '{dotted}'")
        cur = getattr(obj, leaf)
        if isinstance(cur, Genotype) and isinstance(v, dict):
            v = Genotype.from_dict(v)
        setattr(obj, leaf, v)
    return cfg
