"""A/B the half-shift z-form packed conv vs the scattered kernel on TPU.

Shapes: (16,240,320,128) bf16 — the flagship fusion-branch conv shape
(B16 at 480x640 packed). Useful FLOPs per pair counted on the ORIGINAL
conv (9*C or 49*C contraction).

Run: python scripts/bench_zconv.py
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


def timeit(name, fn, *args, gflops=None, iters=5, reps=10):
    def body(*a):
        a = list(a)
        acc = jnp.float32(0)
        for _ in range(reps):
            out = fn(*a)
            s = jnp.sum(out.astype(jnp.float32))
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
    ms = min(ts) / reps * 1e3
    extra = f"  {gflops / ms:7.1f} TF/s useful" if gflops else ""
    print(f"{name:40s} {ms:9.3f} ms{extra}", flush=True)


def main():
    from paif_tpu.ops.packed import conv_same_packed_z, pack_kernel

    print(f"devices: {jax.devices()}")
    B, HP, WP, C = 16, 240, 320, 32
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(B, HP, WP, 4 * C)), jnp.bfloat16)

    for k in (3, 7):
        w = jnp.asarray(rng.normal(size=(k, k, C, C)) * 0.1, jnp.bfloat16)
        useful_gf = 2 * B * (2 * HP) * (2 * WP) * k * k * C * C / 1e9

        def scattered(x, w=w, k=k):
            wp, (rh, rw) = pack_kernel(w, 1)
            return jax.lax.conv_general_dilated(
                x, wp, (1, 1), [(rh, rh), (rw, rw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def zform(x, w=w):
            return conv_same_packed_z(x, w)

        # numerics cross-check on-device
        d = jnp.max(jnp.abs(scattered(xp).astype(jnp.float32) - zform(xp).astype(jnp.float32)))
        print(f"k={k}: scattered-vs-z max abs diff {float(d):.3e}")
        timeit(f"k{k} scattered ({k + (k == 7) * (5 - k)}... packed)", scattered, xp, gflops=useful_gf)
        timeit(f"k{k} z-form", zform, xp, gflops=useful_gf)


if __name__ == "__main__":
    main()
