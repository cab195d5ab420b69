"""bf16-vs-f32 accuracy drift on the real chip (VERDICT round-1 #5).

Runs the synthetic-dataset eval twice on identical weights — once f32
(PAIF_PRECISION=highest, f32 params/inputs) and once on the bf16 fast path
(bf16 params/inputs, 'default' matmul precision) — and reports the mIoU /
mAcc deltas plus the pixel-level prediction agreement. The bf16 path is
what bench.py measures; the parity tests all run f32, so this quantifies
what the fast path costs in accuracy terms.

With --checkpoint it measures drift at a TRAINED operating point (a
train_aat train-state dir or a variables dir) instead of random init
(VERDICT round-2 #8: random weights sit at a near-chance mIoU where drift
behavior may differ). --fast_gf adds a third leg: bf16 + PAIF_FAST_GF=1
(He's subsample-2 guided filter), quantifying the fast-GF approximation in
task terms.

Run: python scripts/bench_bf16_drift.py [--n 16] [--backbone mit_b3]
     [--checkpoint ckpt/aat/step_300] [--fast_gf]
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--backbone", default="mit_b3")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--fast_gf", action="store_true")
    ap.add_argument("--fusion_channels", type=int, default=32)
    args = ap.parse_args()

    # f32 leg runs at HIGHEST precision (the parity default); the bf16 leg
    # flips to 'default' (single-pass bf16 MXU) before its jit.
    os.environ["PAIF_PRECISION"] = "highest"

    import jax
    import jax.numpy as jnp

    from paif_tpu.utils.jax_cache import configure_compile_cache


    configure_compile_cache()

    from paif_tpu.data.synthetic import SyntheticFusionDataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    model = PAIFJoint(
        backbone=args.backbone,
        num_classes=9,
        fusion=lambda: FusionNetSearched(args.fusion_channels, PAIF_GENOTYPE),
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    if args.checkpoint:
        from paif_tpu.io.checkpoint import load_variables

        raw = load_variables(args.checkpoint)
        if "params" in raw:  # train-state dir or plain variables dir
            variables = dict(
                params=raw["params"], batch_stats=raw.get("batch_stats", {})
            )
        print(f"loaded trained weights from {args.checkpoint}", flush=True)
    ds = SyntheticFusionDataset(n=args.n, hw=tuple(args.hw), seed=0)

    print("== f32 (HIGHEST) ==", flush=True)
    m32 = run_eval(
        model, variables, ds, EvalConfig(batch_size=args.batch, use_mesh=False)
    )

    print("== bf16 fast path ==", flush=True)
    os.environ["PAIF_PRECISION"] = "default"
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    vb = dict(variables, params=bf16(variables["params"]))
    mbf = run_eval(
        model, vb, ds,
        EvalConfig(batch_size=args.batch, use_mesh=False, input_dtype="bfloat16"),
    )

    mfast = None
    if args.fast_gf:
        print("== bf16 + fast guided filter ==", flush=True)
        os.environ["PAIF_FAST_GF"] = "1"
        mfast = run_eval(
            model, vb, ds,
            EvalConfig(batch_size=args.batch, use_mesh=False, input_dtype="bfloat16"),
        )
        os.environ["PAIF_FAST_GF"] = "0"

    d_miou = (mbf["iou_mean"] - m32["iou_mean"]) * 100
    d_macc = (mbf["acc_mean"] - m32["acc_mean"]) * 100
    print(
        f"\nmIoU f32 {m32['iou_mean'] * 100:.3f} vs bf16 {mbf['iou_mean'] * 100:.3f}"
        f" -> drift {d_miou:+.3f} pts"
    )
    print(
        f"mAcc f32 {m32['acc_mean'] * 100:.3f} vs bf16 {mbf['acc_mean'] * 100:.3f}"
        f" -> drift {d_macc:+.3f} pts"
    )
    if mfast is not None:
        print(
            f"mIoU bf16+fastGF {mfast['iou_mean'] * 100:.3f}"
            f" -> drift vs f32 {(mfast['iou_mean'] - m32['iou_mean']) * 100:+.3f} pts"
        )


if __name__ == "__main__":
    main()
