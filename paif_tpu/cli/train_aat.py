"""Adversarial-Aware Training (AAT) entry point.

The reference does not release training code (README.md:47-48) but ships the
full loss/optimizer surface; this is the TPU training loop for it: coupled
clean/perturbed batches with on-the-fly PGD inside the jitted step
(BASELINE.json config #5).

Usage:
  python -m paif_tpu.cli.train_aat --synthetic --max_iters 20
  python -m paif_tpu.cli.train_aat --ir_path ... --vi_path ... --label_path ...
"""

from __future__ import annotations

import logging
import time

import jax
import numpy as np

from paif_tpu.attack.pgd import AttackConfig
from paif_tpu.cli.common import (
    base_parser,
    build_dataset,
    build_model,
    build_variables,
    config_from_args,
)
from paif_tpu.data.pipeline import PrefetchLoader, batch_iterator
from paif_tpu.losses import FUSION_LOSSES
from paif_tpu.train.aat import TrainConfig, create_train_state, make_aat_train_step

log = logging.getLogger(__name__)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = base_parser(__doc__)
    p.add_argument("--max_iters", default=None, type=int)
    p.add_argument("--save_every", default=1000, type=int)
    p.add_argument("--out", default="./checkpoints/aat", type=str)
    # coupled AAT data (reference Fusion_dataset_Meta layout): perturbed dirs
    # via --ir_path/--vi_path, originals + decomposition masks here
    p.add_argument("--mask_path", default=None, type=str)
    p.add_argument("--ir_orig_path", default=None, type=str)
    p.add_argument("--vi_orig_path", default=None, type=str)
    p.add_argument("--crop_size", default=None, type=int)
    p.add_argument(
        "--stop_at",
        default=None,
        type=int,
        help="halt this invocation at iteration N without shortening the LR "
        "schedule horizon (which is --max_iters); pair with --resume to "
        "split a run across invocations",
    )
    p.add_argument(
        "--resume",
        default=None,
        type=str,
        help="path of a step_N train-state checkpoint to resume from "
        "(restores step, params, batch_stats AND optimizer moments)",
    )
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    if args.max_iters is not None:
        cfg.train.max_iters = args.max_iters

    model = build_model(cfg, remat=True)
    if args.mask_path and args.ir_orig_path and args.vi_orig_path:
        from paif_tpu.data.datasets import FusionMetaDataset

        dataset = FusionMetaDataset(
            ir_path=cfg.dataset.ir_path,
            vi_path=cfg.dataset.vi_path,
            mask_path=args.mask_path,
            ir_orig_path=args.ir_orig_path,
            vi_orig_path=args.vi_orig_path,
            crop_size=args.crop_size or cfg.train.crop_size,
            seed=cfg.seed,
            label_path=cfg.dataset.label_path,
        )
        meta = True
        meta_labels = cfg.dataset.label_path is not None
    else:
        dataset = build_dataset(cfg)
        meta = meta_labels = False
    hw = dataset[0][0].shape[:2]
    variables = build_variables(cfg, model, hw)

    tcfg = TrainConfig(
        fusion_weight=cfg.train.fusion_weight,
        seg_weight=cfg.train.seg_weight,
        learning_rate=cfg.train.learning_rate,
        warmup_iter=cfg.train.warmup_iter,
        max_iter=cfg.train.max_iters,
        warmup_ratio=cfg.train.warmup_ratio,
        power=cfg.train.power,
        weight_decay=cfg.train.weight_decay,
        attack=AttackConfig(
            epsilon=cfg.attack.epsilon,
            alpha=cfg.attack.alpha,
            iters=cfg.attack.attack_iters,
            way=cfg.attack.attack_way,
        ),
    )
    state = create_train_state(model, variables, tcfg)
    if args.resume:
        from paif_tpu.io.checkpoint import restore_train_state

        state = restore_train_state(args.resume, state)
        log.info("resumed from %s at step %d", args.resume, int(state.step))
    step_fn = make_aat_train_step(model, tcfg, FUSION_LOSSES[cfg.train.fusion_loss])
    key = jax.random.PRNGKey(cfg.seed)

    # Mesh data parallelism: with >1 visible device the state is replicated
    # and each batch sharded on its leading dim; the jitted step runs SPMD
    # with XLA inserting the gradient psums (the dryrun in __graft_entry__
    # proves this step compiles and executes on an 8-device mesh).
    mesh = None
    if jax.device_count() > 1:
        from paif_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        # shard over the largest device count that divides the batch size
        n = jax.device_count()
        while cfg.dataset.batch_size % n:
            n -= 1
        if n > 1:
            mesh = make_mesh(devices=jax.devices()[:n])
            state = replicate(mesh, state)
            log.info(
                "data-parallel over %d devices (%d per chip)",
                n,
                cfg.dataset.batch_size // n,
            )

    it = int(state.step)
    stop_at = min(cfg.train.max_iters, args.stop_at or cfg.train.max_iters)
    t0 = time.time()
    while it < stop_at:
        if meta:
            keys = ("vis", "ir", "vis_orig", "ir_orig", "mask") + (
                ("label", "name") if meta_labels else ("name",)
            )
        else:
            keys = ("vis", "ir", "label", "name")
        loader = PrefetchLoader(
            lambda: batch_iterator(dataset, cfg.dataset.batch_size, keys=keys, drop_last=True)
        )
        for batch in loader:
            ir = batch["ir"].astype(np.float32)
            vis = batch["vis"].astype(np.float32)
            if meta:
                mask = batch["mask"].astype(np.float32)
                if meta_labels:
                    labels = batch["label"].astype(np.int32)
                else:
                    # The reference's coupled loader carries no seg labels
                    # (_loss_coupled's labels come from its unreleased
                    # caller); without --label_path fall back to
                    # mask-thresholded 2-class labels so the seg term stays
                    # active.
                    labels = (mask[..., 0] > 0.5).astype(np.int32)
            else:
                labels = batch["label"]
                # mask target: reference AAT uses a decomposition mask; fall
                # back to max(ir, vis_y) when the dataset carries none.
                mask = batch.get("mask", np.maximum(ir, vis.mean(-1, keepdims=True)))
            step_args = (ir, vis, mask, labels)
            if mesh is not None:
                from paif_tpu.parallel.mesh import shard_batch

                step_args = shard_batch(mesh, step_args)
            state, metrics = step_fn(state, *step_args, jax.random.fold_in(key, it))
            it += 1
            if it % 10 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                log.info("iter %d  %s  (%.2f s)", it, m, time.time() - t0)
            if it % args.save_every == 0 or it >= stop_at:
                from paif_tpu.io.checkpoint import save_train_state

                save_train_state(f"{args.out}/step_{it}", state)
                log.info("saved train state at iter %d", it)
            if it >= stop_at:
                break
    return state


if __name__ == "__main__":
    main()
