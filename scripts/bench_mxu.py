"""MXU ceiling + conv shape sweep: what can this chip actually sustain?

Answers: (a) practical bf16 matmul peak on this v5e via the axon tunnel,
(b) conv TF/s vs channel width (is N=128 the limiter? does H/2,W/2 @ 4C
keep scaling?), (c) GEMM-equivalents of our convs.
Run: python scripts/bench_mxu.py
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


def timeit(name, fn, *args, gflops=None, iters=4, reps=8):
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
    extra = f"  {gflops / ms:8.2f} TF/s" if gflops else ""
    print(f"{name:48s} {ms:9.3f} ms{extra}", flush=True)


def conv(x, w, dil=1):
    k = w.shape[0]
    p = (k - 1) // 2 * dil
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    # (a) pure matmul peak
    for m, k, n in [(4096, 4096, 4096), (8192, 8192, 8192), (614400, 1152, 128),
                    (614400, 1152, 256), (2457600, 288, 32), (153600, 4608, 512)]:
        a = jnp.asarray(rng.normal(0, 1, (m, k)), dt)
        b = jnp.asarray(rng.normal(0, 1, (k, n)), dt)
        gf = 2 * m * k * n / 1e12
        timeit(f"matmul {m}x{k}x{n}", lambda x, y: x @ y, a, b, gflops=gf)

    # (b) conv channel sweep at constant useful work
    B = 8
    for h, w, c, cout in [(480, 640, 32, 32), (240, 320, 64, 64), (240, 320, 128, 128),
                          (240, 320, 128, 256), (120, 160, 256, 256), (120, 160, 512, 512)]:
        x = jnp.asarray(rng.normal(0, 1, (B, h, w, c)), dt)
        wt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, cout)), dt)
        gf = 2 * 9 * c * cout * B * h * w / 1e12
        timeit(f"conv3x3 {c}->{cout} @{h}x{w}", conv, x, wt, gflops=gf)

    # (c) depthwise + dilated shapes from the genotype / MixFFN
    x = jnp.asarray(rng.normal(0, 1, (B, 480, 640, 32)), dt)
    wdw = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, 32)), dt)
    timeit("dwconv3x3 d2 C32 @480x640", lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=32), x, wdw)
    x2 = jnp.asarray(rng.normal(0, 1, (B, 120, 160, 1280)), dt)
    wdw2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, 1280)), dt)
    timeit("dwconv3x3 C1280 @120x160 (MixFFN s3)", lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=1280), x2, wdw2)

    # stems: 1->32 and 3->64 k7s4 (patch embed)
    xi = jnp.asarray(rng.normal(0, 1, (B, 480, 640, 1)), dt)
    ws = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, 32)), dt)
    timeit("conv3x3 1->32 @480x640 (stem)", conv, xi, ws)
    xv = jnp.asarray(rng.normal(0, 1, (B, 480, 640, 3)), dt)
    wpe = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)), dt)
    timeit("conv7x7s4 3->64 (patch embed1)", lambda a, b: jax.lax.conv_general_dilated(
        a, b, (4, 4), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xv, wpe)


if __name__ == "__main__":
    main()
