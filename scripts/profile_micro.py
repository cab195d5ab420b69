"""Dispatch-amortized microbenchmarks: N repetitions of an op inside ONE jit,
so the axon-tunnel per-call overhead (~25ms) divides out.

python scripts/profile_micro.py
"""

import sys

sys.path.insert(0, ".")
import os  # noqa: E402

os.environ.setdefault("PAIF_PRECISION", "default")
import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B, H, W, C = 8, 480, 640, 32
REPS = 10


def timeit(name, fn, *args):
    red = jax.jit(fn)
    float(red(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    per = min(ts) * 1e3 / REPS
    print(f"{name:40s} {per:8.2f} ms/op  ({min(ts)*1e3:7.1f} ms / {REPS} reps)", flush=True)


def chain(f, x0, reps=REPS):
    x = x0
    acc = 0.0
    for _ in range(reps):
        x = f(x)
        acc = acc + jnp.sum(x[..., :1].astype(jnp.float32))
    return acc


def main():
    from flax import linen as nn

    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models.fusion_searched import FusionNetSearched
    from paif_tpu.nn.ops_registry import make_op
    from paif_tpu.ops.guided_filter import guided_filter

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), dt)
    g = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), dt)
    print(f"devices={jax.devices()} dtype=bf16 shape={(B,H,W,C)} reps={REPS}", flush=True)

    # plain conv3x3 C->C
    class C3(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)(x)

    m = C3()
    v = jax.tree_util.tree_map(lambda a: a.astype(dt), m.init(jax.random.PRNGKey(0), x[:1, :64, :64]))
    timeit("conv3x3 32->32", lambda x: chain(lambda y: m.apply(v, y), x), x)

    # conv3x3 at 128 channels for comparison (same FLOPs x16)
    x128 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 128)), dt)

    class C3w(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)(x)

    mw = C3w()
    vw = jax.tree_util.tree_map(lambda a: a.astype(dt), mw.init(jax.random.PRNGKey(0), x128[:1, :64, :64]))
    timeit("conv3x3 128->128 (16x FLOPs)", lambda x: chain(lambda y: mw.apply(vw, y), x), x128)

    # guided filter
    timeit("guided_filter r4", lambda x: chain(lambda y: guided_filter(g, y, 4, 1e-3), x), x)

    # one genotype op: Denseblocks_3_1
    op = make_op(C, "Denseblocks_3_1")
    vo = jax.tree_util.tree_map(lambda a: a.astype(dt), op.init(jax.random.PRNGKey(0), x[:1, :64, :64]))
    timeit("Denseblocks_3_1 (3 convs)", lambda x: chain(lambda y: op.apply(vo, y), x), x)

    op2 = make_op(C, "Residualblocks_7_1")
    vo2 = jax.tree_util.tree_map(lambda a: a.astype(dt), op2.init(jax.random.PRNGKey(0), x[:1, :64, :64]))
    timeit("Residualblocks_7_1", lambda x: chain(lambda y: op2.apply(vo2, y), x), x)

    # full fusion net, dispatch-amortized (3 reps)
    fus = FusionNetSearched(32, PAIF_GENOTYPE)
    ir = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), dt)
    vis = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), dt)
    vf = jax.tree_util.tree_map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
        fus.init(jax.random.PRNGKey(0), ir[:1, :64, :64], vis[:1, :64, :64]),
    )

    def fus3(ir, vis):
        acc = 0.0
        f = ir
        for _ in range(3):
            f = fus.apply(vf, f, vis)
            acc = acc + jnp.sum(f.astype(jnp.float32))
        return acc

    red = jax.jit(fus3)
    float(red(ir, vis))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(red(ir, vis))
        ts.append(time.perf_counter() - t0)
    print(f"{'fusion net fwd (amortized/3)':40s} {min(ts)*1e3/3:8.2f} ms/op", flush=True)


if __name__ == "__main__":
    main()
