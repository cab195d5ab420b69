"""Component-level TPU timing: fusion net, SegFormer, guided filter, resize.

Run: python scripts/profile_components.py [--batch 8]
"""

import argparse
import sys as _sys
_sys.path.insert(0, ".")
import os
import sys
import time

os.environ.setdefault("PAIF_PRECISION", "default")

import jax

if os.environ.get("PAIF_PLATFORM"):  # off-chip smoke: force a backend
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=3):
    """Device-side scalar reduction readback: syncs execution without paying
    the (slow, tunneled) full-output host transfer."""
    red = jax.jit(
        lambda *a: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    float(red(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts) * 1e3:9.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B, H, W = args.batch, 480, 640

    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint, SegFormer
    from paif_tpu.ops.guided_filter import box_filter, guided_filter
    from paif_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    ir = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), dt)
    vis = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), dt)
    feat = jnp.asarray(rng.uniform(0, 1, (B, H, W, 32)), dt)
    guide = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), dt)

    print(f"devices: {jax.devices()}  dtype={dt.__name__}", flush=True)

    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, t
    )

    # guided filter / box filter
    bf = jax.jit(lambda x: box_filter(x, 4))
    timeit("box_filter r4 (B,H,W,32)", bf, feat)
    gf = jax.jit(lambda g, s: guided_filter(g, s, 4, 1e-3))
    timeit("guided_filter r4 (B,H,W,32)", gf, guide, feat)

    # fusion net
    fusion = FusionNetSearched(32, PAIF_GENOTYPE)
    fv = bf16(fusion.init(jax.random.PRNGKey(0), ir[:1, :64, :64], vis[:1, :64, :64]))
    ff = jax.jit(lambda v, i, s: fusion.apply(v, i, s))
    timeit("fusion net fwd", ff, fv, ir, vis)

    # segformer
    seg = SegFormer("mit_b3", 9)
    x3 = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)), dt)
    sv = bf16(seg.init(jax.random.PRNGKey(0), x3[:1, :64, :64]))
    for flag in ("0", "1"):
        os.environ["PAIF_PALLAS_ATTN"] = flag
        sf = jax.jit(lambda v, x: seg.apply(v, x))
        timeit(f"segformer mit_b3 fwd (pallas={flag})", sf, sv, x3)

    # resize
    logits = jnp.asarray(rng.normal(0, 1, (B, H // 4, W // 4, 9)), dt)
    rz = jax.jit(lambda x: resize_bilinear(x, (H, W)))
    timeit("resize 120x160 -> 480x640 (9ch)", rz, logits)

    # full joint
    os.environ["PAIF_PALLAS_ATTN"] = "0"
    joint = PAIFJoint(backbone="mit_b3", num_classes=9, fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE))
    jv = bf16(joint.init(jax.random.PRNGKey(0), ir[:1, :64, :64], vis[:1, :64, :64]))
    jf = jax.jit(lambda v, i, s: joint.apply(v, i, s))
    timeit("joint fwd", jf, jv, ir, vis)


if __name__ == "__main__":
    sys.exit(main())
