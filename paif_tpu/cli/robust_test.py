"""Adversarially-robust evaluation entry point (reference robust_test.py
parity): PGD-family attack on the inputs, then joint fusion+segmentation
eval, fused/attacked/seg image dumps, and the per-class precision/IoU report.

Usage:
  python -m paif_tpu.cli.robust_test --checkpoint ckpt.pth \
      --ir_path .../Infrared --vi_path .../Visible --label_path .../Label \
      --attack_iters 5 --epsilon 0.03137 --alpha 0.00784 --attack_way PGD
  python -m paif_tpu.cli.robust_test --synthetic          # fixture smoke run
"""

from __future__ import annotations

import logging

from paif_tpu.cli.common import (
    attack_config,
    base_parser,
    build_dataset,
    build_model,
    build_variables,
    config_from_args,
    maybe_cast_dtype,
)
from paif_tpu.eval.harness import EvalConfig, run_eval


def main(argv=None) -> dict:
    logging.basicConfig(level=logging.INFO)
    args = base_parser(__doc__).parse_args(argv)
    cfg = config_from_args(args)

    # The PGD inner loop differentiates through the full joint model. Since
    # the round-4 dense-depthwise + fused-box work, no-remat fits up to
    # batch 16 at 480x640 and is both faster (5.88 vs 5.71 attacked
    # pairs/s) and ~10x quicker to compile; larger batches still need
    # per-block remat (b24/b32 OOM at every scope — bench_logs/r4/).
    model = build_model(cfg, remat=cfg.dataset.batch_size > 16)
    dataset = build_dataset(cfg, uint8=True)
    vis0 = dataset[0][0]
    variables = maybe_cast_dtype(cfg, build_variables(cfg, model, vis0.shape[:2]))

    ecfg = EvalConfig(
        batch_size=cfg.dataset.batch_size,
        num_classes=cfg.model.num_classes,
        attack=attack_config(cfg),
        save_dir=cfg.save_dir,
        strategy=cfg.strategy,
        seed=cfg.seed,
        input_dtype=cfg.dtype if cfg.dtype == "bfloat16" else "float32",
    )
    metrics = run_eval(model, variables, dataset, ecfg)
    print("robust eval:", {k: round(v, 6) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
