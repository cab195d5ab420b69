"""Clean-evaluation entry point (reference test_original.py parity).

Usage:
  python -m paif_tpu.cli.test_original --checkpoint ckpt.pth \
      --ir_path .../Infrared --vi_path .../Visible --label_path .../Label
  python -m paif_tpu.cli.test_original --synthetic        # fixture smoke run
"""

from __future__ import annotations

import logging

from paif_tpu.cli.common import (
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

    model = build_model(cfg)
    dataset = build_dataset(cfg, uint8=True)
    vis0 = dataset[0][0]
    variables = maybe_cast_dtype(cfg, build_variables(cfg, model, vis0.shape[:2]))

    ecfg = EvalConfig(
        batch_size=cfg.dataset.batch_size,
        num_classes=cfg.model.num_classes,
        attack=None,
        save_dir=cfg.save_dir,
        strategy=cfg.strategy,
        seed=cfg.seed,
        input_dtype=cfg.dtype if cfg.dtype == "bfloat16" else "float32",
    )
    metrics = run_eval(model, variables, dataset, ecfg)
    print("clean eval:", {k: round(v, 6) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
