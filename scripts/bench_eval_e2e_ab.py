"""Interleaved repeated A/B of the e2e file-eval input-path configs.

Single-shot runs of bench_eval_e2e.py disagree by up to 2.6x across
minutes (round-5 logs: 'both' measured 42.7 then 16.1 pairs/s) — the axon
tunnel's H2D throughput drifts over time, so config A at minute 0 vs
config B at minute 5 measures the NETWORK, not the config. This harness
builds every pipeline variant once (same process, same fixtures, compiled
programs shared) and interleaves R rounds of all configs, reporting
per-config medians — time-varying tunnel state averages out across the
interleaving.

Configs: f32 host path / uint8 base / +combined-H2D / +put-in-loader /
both / both+tensor-cache.

Run: python scripts/bench_eval_e2e_ab.py [--pairs 96] [--rounds 3]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("PAIF_PRECISION", "default")

import jax

if os.environ.get("PAIF_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--root", default="/tmp/paif_e2e")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from scripts.bench_eval_e2e import write_fixtures

    from paif_tpu.data.datasets import FusionDataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    print(f"devices: {jax.devices()}", flush=True)
    write_fixtures(args.root, args.pairs)

    backbone = "mit_b0" if args.smoke else "mit_b3"
    feats = 8 if args.smoke else 32
    model = PAIFJoint(
        backbone=backbone, num_classes=9,
        fusion=lambda: FusionNetSearched(feats, PAIF_GENOTYPE),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    variables = dict(variables, params=bf16(variables["params"]))

    paths = dict(
        ir_path=os.path.join(args.root, "ir"),
        vi_path=os.path.join(args.root, "vi"),
        label_path=os.path.join(args.root, "label"),
    )
    ds_u8 = FusionDataset(**paths, uint8=True)
    ds_f32 = FusionDataset(**paths, uint8=False)
    ds_cache = FusionDataset(**paths, uint8=True, cache_dir=os.path.join(args.root, "cache"))

    configs = [
        ("f32host", ds_f32, {}),
        ("u8base", ds_u8, {}),
        ("u8comb", ds_u8, {"PAIF_COMBINED_H2D": "1"}),
        ("u8loader", ds_u8, {"PAIF_PUT_IN_LOADER": "1"}),
        ("u8both", ds_u8, {"PAIF_COMBINED_H2D": "1", "PAIF_PUT_IN_LOADER": "1"}),
        ("cache", ds_cache, {"PAIF_COMBINED_H2D": "1", "PAIF_PUT_IN_LOADER": "1"}),
    ]
    knob_keys = ("PAIF_COMBINED_H2D", "PAIF_PUT_IN_LOADER")
    results = {name: [] for name, _, _ in configs}
    cfg = EvalConfig(batch_size=args.batch, input_dtype="bfloat16", use_mesh=False)
    for r in range(args.rounds + 1):  # round 0 = warmup (compiles), discarded
        for name, ds, env in configs:
            for k in knob_keys:
                os.environ.pop(k, None)
            os.environ.update(env)
            t0 = time.perf_counter()
            m = run_eval(model, variables, ds, cfg)
            pps = m.get("pairs_per_sec", float("nan"))
            if r > 0:
                results[name].append(pps)
            print(
                f"round {r} {name:9s} {pps:7.2f} pairs/s ({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    for k in knob_keys:
        os.environ.pop(k, None)

    print(f"\n== medians over {args.rounds} interleaved rounds ({args.pairs} pairs, B{args.batch}) ==")
    for name, vals in results.items():
        if vals:
            print(f"  {name:9s} {statistics.median(vals):7.2f} pairs/s  (runs: "
                  + " ".join(f"{v:.1f}" for v in vals) + ")")


if __name__ == "__main__":
    main()
