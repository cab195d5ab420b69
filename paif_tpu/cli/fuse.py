"""Fusion-only entry point (reference val_fusion_model / val_fusion_train):
fuse IR/visible pairs (clean or pre-attacked dirs) and save fused RGB PNGs;
optionally dump decomposition feature/attention heatmaps.

Usage:
  python -m paif_tpu.cli.fuse --ir_path .../Infrared --vi_path .../Visible \
      --checkpoint ckpt.pth --save_dir out/fused
  python -m paif_tpu.cli.fuse --synthetic --save_dir out/ --features
"""

from __future__ import annotations

import logging

from paif_tpu.cli.common import (
    base_parser,
    build_dataset,
    build_model,
    build_variables,
    config_from_args,
)
from paif_tpu.eval.fusion_eval import dump_fusion_features, run_fusion_eval

log = logging.getLogger(__name__)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = base_parser(__doc__)
    p.add_argument("--features", action="store_true", help="dump feature/attention heatmaps")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    save_dir = cfg.save_dir or "./fusion_test"

    model = build_model(cfg)
    dataset = build_dataset(cfg)
    variables = build_variables(cfg, model, dataset[0][0].shape[:2])

    def fusion_apply(v, ir, vis_ycrcb):
        return model.apply(v, ir, vis_ycrcb, method=lambda m, i, s, t=False: m.enhance_net(i, s, t))

    n = run_fusion_eval(fusion_apply, variables, dataset, save_dir, cfg.dataset.batch_size)
    print(f"fused {n} pairs -> {save_dir}")

    if args.features and cfg.model.fusion_model == "searched":
        from paif_tpu.models.fusion_ablation import FusionNetSearchedShow

        show = FusionNetSearchedShow(cfg.model.fusion_channels, cfg.model.genotype)
        show_vars = {"params": variables["params"]["enhance_net"]}
        if "batch_stats" in variables:
            show_vars["batch_stats"] = variables["batch_stats"].get("enhance_net", {})
        vis, ir, _, name = dataset[0]
        paths = dump_fusion_features(show, show_vars, ir, vis, save_dir, name)
        print(f"feature maps: {sorted(paths)}")
    return n


if __name__ == "__main__":
    main()
