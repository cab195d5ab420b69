"""Compare box-filter / guided-filter formulations on the real chip.

Round-2 experiment for VERDICT item #1: the banded dense matmul burns
~90 GF/call of structural zeros; candidates are shift-add (VPU) and a
two-level dilated shift-add. Run: python scripts/bench_boxfilter.py
"""

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


def timeit(name, fn, *args, iters=5, reps=10):
    """reps invocations inside one jit to amortize ~25ms dispatch; a
    zero-valued data dependence chains reps so XLA cannot CSE them."""

    def body(*a):
        a = list(a)
        acc = jnp.float32(0)
        for _ in range(reps):
            out = fn(*a)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))
            acc = acc + s
            a[0] = a[0] + (s * 0).astype(a[0].dtype)
        return acc

    red = jax.jit(body)
    float(red(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts) / reps * 1e3:9.3f} ms", flush=True)


def _band_matrix(n, r):
    idx = np.arange(n)
    return (np.abs(idx[:, None] - idx[None, :]) <= r).astype(np.float32)


def box_matmul(x, r):
    """Round-1 formulation: banded ones-matrix product on the MXU."""
    mh = jnp.asarray(_band_matrix(x.shape[1], r), x.dtype)
    mw = jnp.asarray(_band_matrix(x.shape[2], r), x.dtype)
    y = jnp.einsum("ih,bhwc->biwc", mh, x)
    return jnp.einsum("jw,bhwc->bhjc", mw, y)


def main():
    from paif_tpu.ops.guided_filter import box_filter, guided_filter, guided_filter_multi_eps

    B, H, W, C = 8, 480, 640, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), dt)
    guide = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), dt)

    print(f"devices: {jax.devices()} dtype={dt.__name__}", flush=True)

    # correctness vs matmul reference (f32)
    f32 = feat.astype(jnp.float32)
    ref = jax.jit(lambda x: box_matmul(x, 4))(f32)
    got = jax.jit(lambda x: box_filter(x, 4))(f32)
    print(f"  shift-add max err vs matmul: {float(jnp.max(jnp.abs(got - ref))):.2e}")

    timeit("box matmul r4 (8,480,640,32)", lambda x: box_matmul(x, 4), feat)
    timeit("box shift-add r4 (pkg)", lambda x: box_filter(x, 4), feat)
    timeit("guided_filter 2 separate eps", lambda g, s: (
        guided_filter(g, s, 4, 1e-3), guided_filter(g, s, 4, 1e-4)), guide, feat)
    timeit("guided_filter_multi_eps (fused)", lambda g, s:
        tuple(guided_filter_multi_eps(g, s, 4, (1e-3, 1e-4))), guide, feat)


if __name__ == "__main__":
    main()
