"""Box-kernel pass anatomy: is the W-pass (sublane-misaligned slices) the
cost center, and does a transpose+H-pass+transpose beat it?

The H-pass slices along dim 0 of the (A, B, C4) scratch — whole-(sublane,
lane)-tile addressing, cheap. The W-pass slices along the SUBLANE dim at
offsets 0..2m, each a misaligned vector shift. If those shifts dominate,
running the W-pass as [XLA transpose -> H-pass kernel -> XLA transpose]
trades ~2 HBM-bandwidth passes (~0.8 ms each at B16 flagship shape) for
the shift work.

Run: python scripts/bench_box_passes.py [--batch 16]
"""

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paif_tpu.utils.jax_cache import configure_compile_cache


configure_compile_cache()

from paif_tpu.ops.pallas.box_filter import _pass_kernel, _pick_tile


def h_pass(xp, m=2, xor_bit=2):
    b, hp, wp, c4 = xp.shape
    tw = _pick_tile(wp, (hp + 2 * m) * c4 * 4)
    return pl.pallas_call(
        functools.partial(_pass_kernel, axis=1, xor_bit=xor_bit, m=m),
        grid=(b, wp // tw),
        in_specs=[pl.BlockSpec((1, hp, tw, c4), lambda i, j: (i, 0, j, 0))],
        out_specs=pl.BlockSpec((1, hp, tw, c4), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM((hp + 2 * m, tw, c4), jnp.float32)],
    )(xp)


def w_pass(xp, m=2, xor_bit=1):
    b, hp, wp, c4 = xp.shape
    th2 = _pick_tile(hp, (wp + 2 * m) * c4 * 4)
    return pl.pallas_call(
        functools.partial(_pass_kernel, axis=2, xor_bit=xor_bit, m=m),
        grid=(b, hp // th2),
        in_specs=[pl.BlockSpec((1, th2, wp, c4), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, th2, wp, c4), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM((th2, wp + 2 * m, c4), jnp.float32)],
    )(xp)


def w_as_transposed_h(xp, m=2):
    # W-pass == transpose H<->W, H-pass with the W xor bit, transpose back
    xt = jnp.swapaxes(xp, 1, 2)
    yt = h_pass(xt, m=m, xor_bit=1)
    return jnp.swapaxes(yt, 1, 2)


def timeit(name, fn, x, reps=8, iters=4):
    @jax.jit
    def body(x):
        acc = jnp.float32(0)
        xi = x
        for _ in range(reps):
            out = fn(xi)
            s = jnp.sum(out.astype(jnp.float32))
            acc = acc + s
            xi = x + (s * 0).astype(x.dtype)
        return acc

    float(body(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(body(x))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts) / reps * 1e3:8.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(0, 1, (B, 240, 320, 128)), jnp.bfloat16)
    print(f"devices: {jax.devices()}  shape={xp.shape}", flush=True)

    # correctness of the transposed variant vs the plain W pass
    a = w_pass(xp[:1].astype(jnp.float32))
    b = w_as_transposed_h(xp[:1].astype(jnp.float32))
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"w_pass vs transposed-h max err: {err:.2e}", flush=True)

    timeit("h_pass", h_pass, xp)
    timeit("w_pass", w_pass, xp)
    timeit("w as transpose+h+transpose", w_as_transposed_h, xp)
    timeit("full box (h then w)", lambda x: w_pass(h_pass(x)), xp)
    timeit("full box (h, transposed-h)", lambda x: w_as_transposed_h(h_pass(x)), xp)


if __name__ == "__main__":
    main()
