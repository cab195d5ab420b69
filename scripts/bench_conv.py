"""Small-channel conv strategies at PAIF scale: (8,480,640,32) 3x3 32->32.

The fusion branch (C=32 @ full res) runs at ~2.6% MFU through XLA's direct
conv. Candidates:
  a) lax.conv NHWC (XLA default)
  b) im2col (9 shifted slices concat) + 1x1 matmul  -> K=288, N=32
  c) space-to-depth 2x2 packing: conv as 3x3 on (H/2,W/2,128) with a
     sparse-expanded kernel (4x FLOPs, 128-lane MXU)
  d) wider output test: 3x3 32->128 and 128->128 for MFU reference

Run: python scripts/bench_conv.py
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
        # Chain a zero-valued data dependence through the first arg each rep:
        # defeats CSE of identical pure calls without changing values.
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
    extra = f"  {gflops / ms * 1e3 / 1e3:7.1f} TF/s" if gflops else ""
    print(f"{name:46s} {ms:9.3f} ms{extra}", flush=True)


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_im2col(x, w):
    b, h, wd, c = x.shape
    kh, kw, cin, cout = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            cols.append(xp[:, dy : dy + h, dx : dx + wd, :])
    patches = jnp.concatenate(cols, axis=-1)  # (B,H,W,9C)
    return patches @ w.reshape(kh * kw * cin, cout)


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def pack_kernel_s2d(w):
    """(3,3,C,C) -> (3,3,4C,4C) kernel acting on 2x2 space-to-depth tensors."""
    kh, kw, cin, cout = w.shape
    assert kh == kw == 3
    wp = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    # packed tap (ty,tx) covers original rows 2(i+ty-1)+py, output row 2i+oy
    # original offset dy = 2(ty-1)+py-oy must be in [-1,1]
    for oy in range(2):
        for ox in range(2):
            for py in range(2):
                for px in range(2):
                    for ty in range(3):
                        for tx in range(3):
                            dy = 2 * (ty - 1) + py - oy
                            dx = 2 * (tx - 1) + px - ox
                            if -1 <= dy <= 1 and -1 <= dx <= 1:
                                wp[ty, tx, (py * 2 + px) * cin : (py * 2 + px + 1) * cin,
                                   (oy * 2 + ox) * cout : (oy * 2 + ox + 1) * cout] = w[dy + 1, dx + 1]
    return jnp.asarray(wp)


def conv_s2d(xs, wp):
    return jax.lax.conv_general_dilated(
        xs, wp, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    B, H, W, C = 8, 480, 640, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), dt)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)), dt)

    print(f"devices: {jax.devices()} dtype={dt.__name__}", flush=True)

    # correctness
    ref = jax.jit(conv_xla)(x, w).astype(jnp.float32)
    got = jax.jit(conv_im2col)(x, w).astype(jnp.float32)
    print(f"  im2col err: {float(jnp.max(jnp.abs(got - ref))):.2e}")
    wp = pack_kernel_s2d(np.asarray(w))
    got2 = jax.jit(lambda a, b: d2s(conv_s2d(s2d(a), b)))(x, wp).astype(jnp.float32)
    print(f"  s2d err:    {float(jnp.max(jnp.abs(got2 - ref))):.2e}")

    gf = 2 * 9 * C * C * B * H * W / 1e9
    timeit("3x3 32->32 lax.conv", conv_xla, x, w, gflops=gf)
    timeit("3x3 32->32 im2col+matmul", conv_im2col, x, w, gflops=gf)
    xs = s2d(x)
    timeit("3x3 packed s2d conv (no repack)", conv_s2d, xs, wp, gflops=gf)
    timeit("3x3 s2d conv incl pack/unpack", lambda a, b: d2s(conv_s2d(s2d(a), b)), x, wp, gflops=gf)

    # reference MFU points
    w128 = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, 128)), dt)
    timeit("3x3 32->128 lax.conv", conv_xla, x, w128, gflops=gf * 4)
    x128 = jnp.asarray(rng.normal(0, 1, (B, H // 2, W // 2, 128)), dt)
    w1282 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 128, 128)), dt)
    gf128 = 2 * 9 * 128 * 128 * B * (H // 2) * (W // 2) / 1e9
    timeit("3x3 128->128 @H/2 lax.conv", conv_xla, x128, w1282, gflops=gf128)

    # 1x1 and 7x7 variants used by the genotype
    w7 = jnp.asarray(rng.normal(0, 0.1, (7, 7, C, C)), dt)
    gf7 = 2 * 49 * C * C * B * H * W / 1e9
    timeit("7x7 32->32 lax.conv", lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w7, gflops=gf7)
    w96 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 96, C)), dt)
    x96 = jnp.asarray(rng.normal(0, 1, (B, H, W, 96)), dt)
    timeit("3x3 96->32 lax.conv (dense3)", conv_xla, x96, w96, gflops=gf * 3)


if __name__ == "__main__":
    main()
