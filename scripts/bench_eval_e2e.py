"""End-to-end eval throughput on REAL IMAGE FILES (VERDICT r3 item 4).

All prior on-chip numbers fed synthetic device-resident tensors; at 105
pairs/s the ONE host core must decode ~210 PNGs/s for input to be free.
This bench writes synthetic 480x640 pairs to disk as real PNGs, then runs
the production eval path — FusionDataset (C++ threaded decoder with PIL
fallback) -> PrefetchLoader -> device_prefetch -> jitted eval step with
on-device confusion accumulation — and reports steady-state pairs/s to
compare against the device-only headline.

Reference input path being replaced: robust_test.py:103-111 (PIL loads,
batch 1, no prefetch).

Run: python scripts/bench_eval_e2e.py [--pairs 96] [--batch 16]
     PAIF_PLATFORM=cpu python scripts/bench_eval_e2e.py --pairs 8 --batch 2 --smoke
"""

import argparse
import os
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


def write_fixtures(root: str, n: int) -> None:
    from PIL import Image

    from paif_tpu.data.synthetic import synthesize_pair

    done = os.path.join(root, f".done_{n}")
    if os.path.exists(done):
        return
    rng = np.random.default_rng(0)
    for sub in ("ir", "vi", "label"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    t0 = time.perf_counter()
    for i in range(n):
        vis, ir, label = synthesize_pair(rng)
        name = f"{i:05d}.png"
        Image.fromarray((vis * 255).astype(np.uint8)).save(os.path.join(root, "vi", name))
        Image.fromarray((ir[..., 0] * 255).astype(np.uint8)).save(
            os.path.join(root, "ir", name)
        )
        Image.fromarray(label.astype(np.uint8)).save(os.path.join(root, "label", name))
    open(done, "w").close()
    print(f"wrote {n} PNG pairs in {time.perf_counter() - t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--root", default="/tmp/paif_e2e")
    ap.add_argument("--smoke", action="store_true", help="tiny model (mit_b0)")
    ap.add_argument(
        "--f32path",
        action="store_true",
        help="legacy host-f32 pipeline (A/B vs the uint8 host path)",
    )
    ap.add_argument(
        "--cache",
        action="store_true",
        help="decode-once raw-tensor memmap cache (uint8 mode): the decode "
        "cost moves to a one-time build pass, the timed loop serves slices",
    )
    args = ap.parse_args()

    from paif_tpu.data.datasets import FusionDataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.io import native
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    print(f"devices: {jax.devices()}  native decoder: {native.available()}", flush=True)
    write_fixtures(args.root, args.pairs)

    backbone = "mit_b0" if args.smoke else "mit_b3"
    feats = 8 if args.smoke else 32
    model = PAIFJoint(
        backbone=backbone,
        num_classes=9,
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

    t0 = time.perf_counter()
    dataset = FusionDataset(
        ir_path=os.path.join(args.root, "ir"),
        vi_path=os.path.join(args.root, "vi"),
        label_path=os.path.join(args.root, "label"),
        uint8=not args.f32path,
        cache_dir=os.path.join(args.root, "cache") if args.cache else None,
    )
    if args.cache:
        print(f"tensor cache ready in {time.perf_counter() - t0:.1f}s "
              f"(built once, reused across runs)", flush=True)
    cfg = EvalConfig(batch_size=args.batch, input_dtype="bfloat16", use_mesh=False)
    t0 = time.perf_counter()
    metrics = run_eval(model, variables, dataset, cfg)
    dt = time.perf_counter() - t0
    pps = metrics.get("pairs_per_sec", float("nan"))
    print(
        f"e2e file eval: {args.pairs} pairs, batch {args.batch}: "
        f"steady {pps:.2f} pairs/s (wall {dt:.1f}s incl compile)",
        flush=True,
    )
    # host decode ceiling for context: time the dataset alone (decoder path)
    t0 = time.perf_counter()
    k = min(32, len(dataset))
    for i in range(k):
        dataset[i]
    host = k / (time.perf_counter() - t0)
    print(f"host decode alone: {host:.2f} pairs/s (1 core)", flush=True)


if __name__ == "__main__":
    main()
