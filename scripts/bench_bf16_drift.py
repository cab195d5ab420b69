"""bf16-vs-f32 accuracy drift on the real chip (VERDICT round-1 #5).

Runs the synthetic-dataset eval twice on identical weights — once f32
(PAIF_PRECISION=highest, f32 params/inputs) and once on the bf16 fast path
(bf16 params/inputs, 'default' matmul precision) — and reports the mIoU /
mAcc deltas plus the pixel-level prediction agreement. The bf16 path is
what bench.py measures; the parity tests all run f32, so this quantifies
what the fast path costs in accuracy terms.

Run: python scripts/bench_bf16_drift.py [--n 16] [--backbone mit_b3]
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
    args = ap.parse_args()

    # f32 leg runs at HIGHEST precision (the parity default); the bf16 leg
    # flips to 'default' (single-pass bf16 MXU) before its jit.
    os.environ["PAIF_PRECISION"] = "highest"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from paif_tpu.data.synthetic import SyntheticFusionDataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    model = PAIFJoint(
        backbone=args.backbone,
        num_classes=9,
        fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
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


if __name__ == "__main__":
    main()
