"""Clean vs PGD-5 vs PGD-10 mIoU across AAT checkpoints (VERDICT r4 item 3).

The reference's entire reason to exist is that adversarially-aware training
of the joint fusion+seg model improves robustness of the downstream
segmentation (reference README.md:17; training surface
core/model_fusion_auto.py:1102-1109 `_loss_coupled`). No prior round ever
demonstrated the trend — the r3/r4 operating points were 300-iter warmup
fragments. This script evaluates a sequence of train_aat checkpoints (plus
random init as the 0-iter anchor) on a HELD-OUT synthetic set (seed differs
from the training set's seed 0) under no attack / PGD-5 / PGD-10 and prints
the trend table for BASELINE.md.

PGD protocol: the reference robust_test.py:40-42 defaults — l_seg PGD on
both modalities, eps 8/255, alpha 2/255.

Run (after scripts/run_r5_aat.sh):
  python scripts/eval_robustness_trend.py \
      --checkpoints init checkpoints/aat_r5/step_200 \
                    checkpoints/aat_r5/step_1000 checkpoints/aat_r5/step_2000
Smoke: PAIF_PLATFORM=cpu python scripts/eval_robustness_trend.py --smoke
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("PAIF_PRECISION", "default")  # production bf16 path

import jax

if os.environ.get("PAIF_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints", nargs="+", default=["init"])
    ap.add_argument("--n", type=int, default=16, help="held-out pairs")
    ap.add_argument("--seed", type=int, default=7, help="eval-set seed (train used 0)")
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 256))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, nargs="+", default=[0, 5, 10])
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    from paif_tpu.attack.pgd import AttackConfig
    from paif_tpu.data.synthetic import SyntheticFusionDataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    if args.smoke:
        args.hw, args.n, args.batch = (64, 64), 4, 2
        args.iters = [0, 1]
        backbone, feats = "mit_b0", 8
    else:
        backbone, feats = "mit_b3", 32

    # remat as the robust CLI builds it (cli/common.build_model remat=True):
    # the attacked eval step differentiates through the model
    model = PAIFJoint(
        backbone=backbone,
        num_classes=9,
        fusion=lambda: FusionNetSearched(feats, PAIF_GENOTYPE, remat_filter=True),
        remat=True,
    )
    init_vars = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )

    ds = SyntheticFusionDataset(n=args.n, hw=tuple(args.hw), seed=args.seed)
    table = {}
    for ck in args.checkpoints:
        if ck == "init":
            variables = init_vars
        else:
            from paif_tpu.io.checkpoint import load_variables

            raw = load_variables(ck)
            variables = dict(params=raw["params"], batch_stats=raw.get("batch_stats", {}))
        vb = dict(variables, params=bf16(variables["params"]))
        row = {}
        for it in args.iters:
            atk = None if it == 0 else AttackConfig(iters=it)
            t0 = time.perf_counter()
            m = run_eval(
                model,
                vb,
                ds,
                EvalConfig(
                    batch_size=args.batch,
                    attack=atk,
                    use_mesh=False,
                    input_dtype="bfloat16",
                ),
            )
            row[it] = (m["iou_mean"] * 100, m["acc_mean"] * 100)
            print(
                f"{ck}  PGD-{it}: mIoU {row[it][0]:.3f}  mAcc {row[it][1]:.3f} "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
        table[ck] = row

    print("\n== robustness trend (mIoU / mAcc, held-out synthetic, seed "
          f"{args.seed}) ==", flush=True)
    hdr = "checkpoint".ljust(36) + "".join(f"PGD-{it}".rjust(16) for it in args.iters)
    print(hdr)
    for ck, row in table.items():
        cells = "".join(f"{row[it][0]:7.2f}/{row[it][1]:<7.2f}" for it in args.iters)
        print(ck.ljust(36) + cells)


if __name__ == "__main__":
    main()
