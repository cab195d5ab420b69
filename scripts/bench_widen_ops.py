"""Micro-cost of the packed guide<->src width ops (round-5 glue hunt).

The GF backward's 30.4 ms of "glue" (bench_logs/r5/gf_grad_bisect.log:
gf_bwd_alone 46.2 vs bwd_boxes 15.8) is ~7x the raw HBM bound of its
elementwise chains — so the cost is layout, not bandwidth. Chief suspect:
`unwiden` (ops/guided_filter._helpers), a stride-4 cross-lane reduction
reshape(B,H,W,C,4).sum(-2) that TPU lowers as a sublane/lane restructuring;
the backward runs 4 of them at src width. Alternative formulation: a
(128,4) 0/1 lane-selection matmul on the MXU (reads the tensor once,
no relayout). widen (jnp.tile) likewise vs broadcast-matmul.

Rows (at (16,240,320,128) bf16):
  unwiden_reshape   x.reshape(...,C,4).sum(-2)
  unwiden_matmul    einsum('bhwl,lp->bhwp')
  widen_tile        jnp.tile(g, (1,1,1,C))
  widen_matmul      einsum('bhwp,pl->bhwl')
  residue_grad      grad of channel max-min (equality-mask scatter)
  eltwise5          5-op fused elementwise chain (the BW yardstick)

Run: python scripts/bench_widen_ops.py
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


def slope(make_looped, args, r1, r2, label):
    f1, f2 = make_looped(r1), make_looped(r2)
    t0 = time.perf_counter()
    float(f1(*args))
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    float(f2(*args))
    ta = tb = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(f1(*args))
        ta = min(ta or 1e9, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f2(*args))
        tb = min(tb or 1e9, time.perf_counter() - t0)
    dt = (tb - ta) / (r2 - r1)
    if dt <= 0:
        dt = ta / r1
    print(f"{label}: {dt * 1e3:7.2f} ms", flush=True)
    return dt * 1e3


def looped(fn):
    def make(r):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc + fn(*args, acc * 0 + jnp.float32(i))

            return jax.lax.fori_loop(0, r, body, jnp.float32(0))

        return run

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--r1", type=int, default=2)
    ap.add_argument("--r2", type=int, default=6)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    if args.smoke:
        B, HP, WP, C = 2, 16, 20, 8
    else:
        B, HP, WP, C = args.batch, 240, 320, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, HP, WP, 4 * C)), dt)
    g = jnp.asarray(rng.uniform(0, 1, (B, HP, WP, 4)), dt)

    sel = np.zeros((4 * C, 4), np.float32)
    sel[np.arange(4 * C), np.arange(4 * C) % 4] = 1.0
    sel_b = jnp.asarray(sel, dt)

    def unwiden_reshape(t, salt):
        t = t + salt.astype(t.dtype) * 0
        r = t.reshape(*t.shape[:-1], C, 4).sum(-2)
        return jnp.sum(r.astype(jnp.float32))

    def unwiden_matmul(t, m, salt):
        t = t + salt.astype(t.dtype) * 0
        r = jnp.einsum("bhwl,lp->bhwp", t, m)
        return jnp.sum(r.astype(jnp.float32))

    def widen_tile(t, salt):
        t = t + salt.astype(t.dtype) * 0
        r = jnp.tile(t, (1, 1, 1, C))
        return jnp.sum(r.astype(jnp.float32))

    def widen_matmul(t, m, salt):
        t = t + salt.astype(t.dtype) * 0
        r = jnp.einsum("bhwp,pl->bhwl", t, m.T)
        return jnp.sum(r.astype(jnp.float32))

    def residue_grad(t, salt):
        from paif_tpu.nn.cells import residue
        from paif_tpu.ops.packed import packed_mode

        def loss(u):
            with packed_mode(True):
                return jnp.sum(residue(u).astype(jnp.float32))

        gr = jax.grad(loss)(t + salt.astype(t.dtype) * 0)
        return jnp.sum(gr.astype(jnp.float32))

    def eltwise5(t, u, salt):
        t = t + salt.astype(t.dtype) * 0
        r = (t * u + t) * u - t * 0.5 + u
        return jnp.sum(r.astype(jnp.float32))

    rows = [
        ("unwiden_reshape", unwiden_reshape, (x,)),
        ("unwiden_matmul", unwiden_matmul, (x, sel_b)),
        ("widen_tile", widen_tile, (g,)),
        ("widen_matmul", widen_matmul, (g, sel_b)),
        ("residue_grad", residue_grad, (x,)),
        ("eltwise5", eltwise5, (x, x)),
    ]
    results = {}
    for name, fn, arrs in rows:
        try:
            results[name] = slope(looped(fn), arrs, args.r1, args.r2, f"{name:16s}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    print(f"\n== summary (ms, B{B}) ==")
    for k, v in results.items():
        print(f"  {k:18s} {v:8.2f}")


if __name__ == "__main__":
    main()
