"""Isolate the fusion-branch backward tax (roofline2_s3: fusion_grad 426.7
ms vs fusion_fwd 102.1 — 4.2x, where an input-grad should cost ~1x fwd on
top of the fwd itself).

Times, at the packed flagship shape (16,240,320,128) bf16:
  conv fwd              the scattered packed k3 (the hot op)
  conv input-grad       vjp wrt x with a REAL cotangent argument — XLA's
                        auto transpose, pure bwd (grad-of-sum would give an
                        all-ones cotangent that constant-folds away)
  conv manual-T         the same input-grad written as an ORDINARY conv of
                        the cotangent with the rot180/IO-swapped kernel —
                        if this is faster, XLA's transposed-conv layout
                        choice is the tax and a custom-vjp wrapper fixes it
  dwconv variants       the block-diagonal dense depthwise route, same 3 ways
  chain op fwd/grad     one SepConv-style op: conv3x3 -> prelu -> conv3x3

Run: python scripts/bench_conv_grad.py [--batch 16]
     PAIF_PLATFORM=cpu python scripts/bench_conv_grad.py --smoke
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

from paif_tpu.ops.packed import conv_same_packed


def timeit(name, fn, *args, iters=4, reps=8):
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
    t0 = time.perf_counter()
    float(red(*args))
    print(f"{name:36s} compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / reps * 1e3
    print(f"{name:36s} {ms:9.3f} ms", flush=True)
    return ms


def manual_input_grad(g, w):
    """Input-grad of a SAME stride-1 conv as an ordinary conv: cotangent
    convolved with the spatially-flipped, I/O-swapped kernel."""
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    return conv_same_packed(g, wt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    if args.smoke:
        B, HP, WP, C = 2, 16, 20, 8
    else:
        B, HP, WP, C = args.batch, 240, 320, 32
    dt = jnp.bfloat16
    xp = jnp.asarray(rng.normal(0, 1, (B, HP, WP, 4 * C)), dt)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)), dt)
    w3b = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)), dt)

    # a REAL cotangent (an all-ones one from grad-of-sum constant-folds the
    # whole transpose away); vjp-with-argument keeps only the pure backward
    g = jnp.asarray(rng.normal(0, 1, xp.shape), dt)

    def vjp_x(fn):
        def run(gg, x, *ws):
            _, pull = jax.vjp(lambda xx: fn(xx, *ws), x)
            return pull(gg)[0]

        return run

    t_fwd = timeit("conv3 fwd", lambda x, w: conv_same_packed(x, w), xp, w3)
    t_auto = timeit("conv3 input-grad (XLA transpose)", vjp_x(conv_same_packed), g, xp, w3)
    t_man = timeit("conv3 manual-T conv", manual_input_grad, g, w3)

    # depthwise (block-diagonal dense route), groups = C
    wdw = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, C)), dt)
    dw = lambda x, w: conv_same_packed(x, w, groups=C)  # noqa: E731
    t_dwf = timeit("dwconv fwd (dense route)", dw, xp, wdw)
    t_dwg = timeit("dwconv input-grad", vjp_x(dw), g, xp, wdw)

    # two-conv chain with a nonlinearity: does the saved activation's
    # re-read explain the tax?
    def chain(x, wa, wb):
        h = conv_same_packed(x, wa)
        h = jnp.maximum(h, 0.25 * h)  # prelu-ish
        return conv_same_packed(h, wb)

    t_cf = timeit("chain fwd", chain, xp, w3, w3b)
    t_cg = timeit("chain input-grad", vjp_x(chain), g, xp, w3, w3b)

    print("\n== ratios ==")
    print(f"conv3: grad/fwd {t_auto / t_fwd:.2f}x  manual-T/fwd {t_man / t_fwd:.2f}x")
    print(f"dw:    grad/fwd {t_dwg / t_dwf:.2f}x")
    print(f"chain: grad/fwd {t_cg / t_cf:.2f}x (expect ~3x: bwd needs the fwd act)")


if __name__ == "__main__":
    main()
