"""Shared CLI plumbing: argument parsing, model/dataset/variables builders."""

from __future__ import annotations

import argparse
import logging
import os
from typing import Tuple

import jax

# Platform escape hatch: this image's sitecustomize pins the axon TPU
# plugin at interpreter start, and JAX_PLATFORMS env cannot override it.
# PAIF_PLATFORM=cpu routes the CLIs through jax.config (must happen before
# any backend touch) — CPU smoke runs and TPU-tunnel outages. Pair with
# PAIF_CPU_DEVICES=8 to get the virtual CPU mesh (tests/conftest.py
# style) so the mesh-DP CLI paths actually shard instead of silently
# running single-device.
if os.environ.get("PAIF_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
    if os.environ.get("PAIF_CPU_DEVICES"):
        jax.config.update("jax_num_cpu_devices", int(os.environ["PAIF_CPU_DEVICES"]))

import jax.numpy as jnp

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()  # repo-local persistent compile cache

from paif_tpu.attack.pgd import AttackConfig
from paif_tpu.genotype import Genotype
from paif_tpu.models import FusionNetSearched, PAIFJoint
from paif_tpu.utils.config import Config, load_config

log = logging.getLogger(__name__)


def base_parser(description: str) -> argparse.ArgumentParser:
    """Flags mirroring the reference CLIs (robust_test.py:27-47) plus config."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", default=None, type=str, help="YAML config path")
    p.add_argument("--checkpoint", default=None, type=str, help=".pth or orbax dir")
    p.add_argument("--backbone", default=None, type=str)
    p.add_argument("--batch_size", "-B", default=None, type=int)
    p.add_argument("--ir_path", default=None, type=str)
    p.add_argument("--vi_path", default=None, type=str)
    p.add_argument("--label_path", default=None, type=str)
    p.add_argument("--save_dir", default=None, type=str)
    p.add_argument("--synthetic", action="store_true", help="run on generated fixtures")
    p.add_argument("--strategy", default=None, type=str)
    # attack flags (reference defaults)
    p.add_argument("--epsilon", default=None, type=float)
    p.add_argument("--alpha", default=None, type=float)
    p.add_argument("--attack_iters", default=None, type=int)
    p.add_argument("--attack_loss", default=None, type=str)
    p.add_argument("--attack_way", default=None, type=str)
    p.add_argument("--attack_mode", default=None, type=str)
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    cfg = load_config(args.config)
    amap = {
        "checkpoint": ("checkpoint",),
        "save_dir": ("save_dir",),
        "strategy": ("strategy",),
        "backbone": ("model", "backbone"),
        "batch_size": ("dataset", "batch_size"),
        "ir_path": ("dataset", "ir_path"),
        "vi_path": ("dataset", "vi_path"),
        "label_path": ("dataset", "label_path"),
        "epsilon": ("attack", "epsilon"),
        "alpha": ("attack", "alpha"),
        "attack_iters": ("attack", "attack_iters"),
        "attack_loss": ("attack", "attack_loss"),
        "attack_way": ("attack", "attack_way"),
        "attack_mode": ("attack", "attack_mode"),
    }
    for flag, path in amap.items():
        v = getattr(args, flag, None)
        if v is not None:
            obj = cfg
            for part in path[:-1]:
                obj = getattr(obj, part)
            setattr(obj, path[-1], v)
    if getattr(args, "synthetic", False):
        cfg.dataset.synthetic = True
    return cfg


def attack_config(cfg: Config) -> AttackConfig:
    a = cfg.attack
    return AttackConfig(
        epsilon=a.epsilon,
        alpha=a.alpha,
        iters=a.attack_iters,
        restarts=a.restarts,
        loss=a.attack_loss,
        way=a.attack_way,
        mode=a.attack_mode,
    )


def build_model(cfg: Config, remat: bool | Tuple[int, ...] = False) -> PAIFJoint:
    m = cfg.model
    genotype: Genotype = m.genotype
    if m.fusion_model == "searched":
        # remat-built models are the memory-tight differentiating paths
        # (robust eval, AAT training): lean guided-filter gradients too.
        fusion = lambda: FusionNetSearched(  # noqa: E731
            m.fusion_channels, genotype, remat_filter=bool(remat)
        )
    else:
        from paif_tpu.models.registry import FUSION_ZOO

        ctor = FUSION_ZOO[m.fusion_model]
        fusion = lambda: ctor()  # noqa: E731
    return PAIFJoint(
        backbone=m.backbone,
        num_classes=m.num_classes,
        embedding_dim=m.embedding_dim,
        fusion=fusion,
        remat=remat,
    )


def build_variables(cfg: Config, model: PAIFJoint, image_hw: Tuple[int, int]):
    """Checkpoint if given (torch .pth or orbax), else random init."""
    h, w = image_hw
    template = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.zeros((1, h, w, 1), jnp.float32),
        jnp.zeros((1, h, w, 3), jnp.float32),
    )
    if cfg.checkpoint:
        from paif_tpu.io.checkpoint import load_any_checkpoint
        from paif_tpu.io.torch_import import joint_entries

        entries = joint_entries(cfg.model.genotype, cfg.model.backbone)
        variables = load_any_checkpoint(cfg.checkpoint, entries, template)
        log.info("loaded checkpoint %s", cfg.checkpoint)
        return variables
    log.warning("no checkpoint given — using random init")
    return template


def build_dataset(cfg: Config, uint8: bool = False):
    """`uint8=True` keeps the host pipeline in the decoded uint8 domain (the
    eval harness normalizes on device) — only for consumers that go through
    `run_eval`; `fuse`/`train_aat` index items directly and expect float32.

    PAIF_TENSOR_CACHE=<dir>: decode-once memmap tensor cache (uint8 mode) —
    repeat evals over the same files skip the PNG decode floor entirely
    (data/datasets.FusionDataset cache_dir)."""
    d = cfg.dataset
    if d.synthetic or not (d.ir_path and d.vi_path):
        from paif_tpu.data.synthetic import make_synthetic_dataset

        log.info("using %d synthetic %sx%s pairs", d.synthetic_n, *d.image_hw)
        return make_synthetic_dataset(n=d.synthetic_n, hw=tuple(d.image_hw))
    from paif_tpu.data.datasets import FusionDataset

    return FusionDataset(
        ir_path=d.ir_path,
        vi_path=d.vi_path,
        label_path=d.label_path,
        uint8=uint8,
        cache_dir=os.environ.get("PAIF_TENSOR_CACHE") if uint8 else None,
    )


def maybe_cast_dtype(cfg: Config, variables):
    """bfloat16 parameter cast for throughput runs (batch_stats stay f32)."""
    if cfg.dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables["params"],
        )
        return dict(variables, params=params)
    return variables
