"""Hunt the fusion-branch composition gap (round-5 session 1).

The r5 per-stage bisect sums to ~295 ms of backward (decom 219 + chain3 23.7
+ gate 14.2 + stems/head) vs the measured 426.7 ms whole-branch grad
(roofline2_s3) — ~130 ms lives at the COMPOSITION boundary, not in any
stage. Chief suspect: the pack/unpack layout boundary at full resolution.
FusionNetSearched packs its (B,480,640,1) inputs 2x2 and unpacks the
(B,480,640,1) output (models/fusion_searched.py:59-91); C=1 NHWC tensors
tile to 128 lanes (128x padding), so every transpose/reshape there moves
two orders of magnitude more HBM than the payload — and the backward runs
the mirror images of all three.

Rows:
  fus_fwd / fus_grad            whole branch, full-res (B,H,W,1) io — the
                                roofline2 numbers, re-measured today
  fus_fwd_packedio / _grad      same net but called on PRE-PACKED inputs
                                (already_packed path, fusion_searched.py:52)
                                with the output left packed: body only
  pack_grad                     the boundary alone: pack(ir), pack(vis),
                                sum -> grad (fwd pack + bwd unpack pair)
  fus_grad_einsumbox            whole branch with PAIF_PALLAS_BOX_DIFF=0
                                (isolated GF grad measured einsum 48.4 vs
                                fused 62.7 — does it hold in context?)

Run: python scripts/bench_fusion_boundary.py
Smoke: PAIF_PLATFORM=cpu python scripts/bench_fusion_boundary.py --smoke
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
        print(f"{label}: slope non-positive, using single-dispatch", flush=True)
    print(f"{label}: {dt * 1e3:7.1f} ms", flush=True)
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


def safe(name, thunk):
    try:
        return thunk()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--r1", type=int, default=1)
    ap.add_argument("--r2", type=int, default=3)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched
    from paif_tpu.ops.packed import pack, packed_mode

    if args.smoke:
        B, H, W, feats = 2, 32, 40, 8
    else:
        B, H, W, feats = args.batch, 480, 640, 32
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.bfloat16)
    vis = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.bfloat16)
    irp = jnp.asarray(pack(np.asarray(ir, np.float32)), jnp.bfloat16)
    visp = jnp.asarray(pack(np.asarray(vis[..., 0:1], np.float32)), jnp.bfloat16)

    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    fus = FusionNetSearched(feats, PAIF_GENOTYPE)
    vf = bf16(
        jax.jit(fus.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 3))
        )
    )

    results = {}

    def row(name, fn, arrs):
        results[name] = safe(
            name, lambda: slope(looped(fn), arrs, args.r1, args.r2, f"{name:18s}")
        )

    # whole branch, full-res io (roofline2's fus_* rows)
    def loss(vv, i, s):
        return jnp.sum(fus.apply(vv, i, s).astype(jnp.float32))

    g = jax.grad(loss, argnums=(1, 2))

    def fwd(vv, i, s, salt):
        return loss(vv, i + salt.astype(i.dtype) * 0, s)

    def grad(vv, i, s, salt):
        di, ds = g(vv, i + salt.astype(i.dtype) * 0, s)
        return jnp.sum(di.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    row("fus_fwd", fwd, (vf, ir, vis))
    row("fus_grad", grad, (vf, ir, vis))

    # body only: pre-packed 4-channel inputs, packed output
    def loss_p(vv, ip_, sp_):
        with packed_mode(True):
            out = fus.apply(vv, ip_, sp_)
        return jnp.sum(out.astype(jnp.float32))

    gp = jax.grad(loss_p, argnums=(1, 2))

    def fwd_p(vv, ip_, sp_, salt):
        return loss_p(vv, ip_ + salt.astype(ip_.dtype) * 0, sp_)

    def grad_p(vv, ip_, sp_, salt):
        di, ds = gp(vv, ip_ + salt.astype(ip_.dtype) * 0, sp_)
        return jnp.sum(di.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    row("fus_fwd_packedio", fwd_p, (vf, irp, visp))
    row("fus_grad_packedio", grad_p, (vf, irp, visp))

    # the boundary alone
    def pack_loss(i, s):
        return (
            jnp.sum(pack(i).astype(jnp.float32))
            + jnp.sum(pack(s[..., 0:1]).astype(jnp.float32))
        )

    gpk = jax.grad(pack_loss, argnums=(0, 1))

    def pack_grad(i, s, salt):
        di, ds = gpk(i + salt.astype(i.dtype) * 0, s)
        return jnp.sum(di.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    row("pack_grad", pack_grad, (ir, vis))

    # whole branch with einsum boxes in the diff path
    os.environ["PAIF_PALLAS_BOX_DIFF"] = "0"
    try:
        row("fus_grad_einsumbox", grad, (vf, ir, vis))
    finally:
        os.environ["PAIF_PALLAS_BOX_DIFF"] = "1"

    print(f"\n== summary (ms, B{B}) ==", flush=True)
    for k, v in results.items():
        if v is not None:
            print(f"  {k:20s} {v:8.1f}")
    a, b = results.get("fus_grad"), results.get("fus_grad_packedio")
    if a and b:
        print(f"  boundary cost in grad: {a - b:.1f} ms")


if __name__ == "__main__":
    main()
