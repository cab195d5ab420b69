"""Joint-model anatomy, amortized: full joint vs fusion leg vs normalize
chain vs SegFormer leg. Finds glue costs the component benches miss
(C=3 color tensors pad 128/3 = 42x on the minor dim).

Run: python scripts/bench_joint_anatomy.py [--batch 16] [--reps 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("PAIF_PRECISION", "default")

import jax

if os.environ.get("PAIF_PLATFORM"):  # off-chip smoke: force a backend
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from paif_tpu.utils.jax_cache import configure_compile_cache


configure_compile_cache()


def timeit(name, fn, *args, iters=3, reps=10):
    def body(*a):
        a = list(a)
        acc = jnp.float32(0)
        for _ in range(reps):
            out = fn(*a)
            s = sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "astype")
            )
            acc = acc + s
            a[-1] = jax.tree_util.tree_map(lambda t: t + (s * 0).astype(t.dtype), a[-1])
        return acc

    red = jax.jit(body)
    try:
        float(red(*args))
    except Exception as e:
        print(f"{name:36s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:100]}")
        return None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts) / reps * 1e3:8.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    B, reps = args.batch, args.reps

    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    model = PAIFJoint(
        backbone="mit_b3", num_classes=9, fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE)
    )
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    ir = jnp.asarray(rng.uniform(0, 1, (B, 480, 640, 1)), dt)
    vis = jnp.asarray(rng.uniform(0, 1, (B, 480, 640, 3)), dt)
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    v = dict(v, params=jax.tree_util.tree_map(lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, v["params"]))

    print(f"devices: {jax.devices()}  B={B} reps={reps}", flush=True)

    timeit("full joint", lambda vv, i, s: model.apply(vv, i, s), v, ir, vis, reps=reps)
    timeit("fuse leg only", lambda vv, i, s: model.apply(vv, i, s, method="fuse"), v, ir, vis, reps=reps)

    fused = model.apply(v, ir, vis, method="fuse")
    timeit(
        "seg_input chain only",
        lambda vv, f, s: model.apply(vv, f, s, method="seg_input"),
        v,
        fused,
        vis,
        reps=reps,
    )
    seg_in = model.apply(v, fused, vis, method="seg_input")
    timeit(
        "denoise_net (SegFormer) only",
        lambda vv, x: model.apply(vv, x, method=lambda m, xx: m.denoise_net(xx)),
        v,
        seg_in,
        reps=reps,
    )


if __name__ == "__main__":
    main()
