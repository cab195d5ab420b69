"""Inside the guided-filter backward: where do 180.7 ms of in-context grad go?

Round-5 session-1 grad bisect (bench_logs/r5/grad_bisect.log) pinned the
fusion-branch backward tax on the GF: in-context (CellDecom minus a stubbed
split) fwd 56.9 ms vs grad 180.7 ms at B16 packed flagship, while the
isolated roofline2 gf_grad row was 63.1 ms/call. This script decomposes the
custom-vjp backward itself (ops/guided_filter.py _gf_backward):

  gf_fwd_primal   primal path (fused Pallas boxes) — the clean-forward cost
  gf_fwd_diff     the DIFFERENTIATED forward alone (custom-vjp fwd leg)
  gf_grad         fwd+bwd, default knobs (PAIF_PALLAS_BOX_DIFF=1)
  gf_grad_einsum  fwd+bwd with einsum boxes (PAIF_PALLAS_BOX_DIFF=0)
  gf_bwd_alone    _gf_backward jitted directly on precomputed residuals
  bwd_boxes       just the backward's box calls (fused 4 + fused 2 +
                  2 guide-width dense) — bwd_alone minus this = elementwise
                  glue + layout cost
  decom_split_*   the full in-context decompose() (residue guide + GF +
                  hf concat) fwd and grad

Run: python scripts/bench_gf_grad_bisect.py
Smoke: PAIF_PLATFORM=cpu python scripts/bench_gf_grad_bisect.py --smoke
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

    # NOTE: `import paif_tpu.ops.guided_filter as X` binds the FUNCTION
    # guided_filter (ops/__init__ re-exports it over the submodule attr);
    # fetch the module object itself.
    import paif_tpu.ops.guided_filter  # noqa: F401

    gf_mod = sys.modules["paif_tpu.ops.guided_filter"]
    from paif_tpu.nn.cells import decompose
    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import box_filter_packed, packed_mode

    if args.smoke:
        B, HP, WP, C4 = 2, 16, 20, 32
    else:
        B, HP, WP, C4 = args.batch, 240, 320, 128
    R, EPS = 4, (1e-3, 1e-4)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    guide = jnp.asarray(rng.uniform(0, 1, (B, HP, WP, 4)), dt)
    src = jnp.asarray(rng.uniform(0, 1, (B, HP, WP, C4)), dt)

    results = {}

    def row(name, fn, arrs):
        results[name] = safe(
            name, lambda: slope(looped(fn), arrs, args.r1, args.r2, f"{name:16s}")
        )

    # 1. primal forward (fused Pallas boxes — what the clean fwd pays)
    def fwd_primal(g, s, salt):
        with packed_mode(True):
            outs = guided_filter_multi_eps(g + salt.astype(g.dtype) * 0, s, R, EPS)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    row("gf_fwd_primal", fwd_primal, (guide, src))

    # 2. the differentiated-path forward alone (custom-vjp fwd leg)
    def fwd_diff(g, s, salt):
        outs, _res = gf_mod._gf_forward(
            True, R, EPS, g + salt.astype(g.dtype) * 0, s,
            allow_pallas=False, diff_fused=gf_mod.pallas_box_diff_enabled(),
        )
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    row("gf_fwd_diff", fwd_diff, (guide, src))

    # 3/4. fwd+bwd with fused vs einsum boxes
    def gf_loss(g, s):
        with packed_mode(True):
            outs = guided_filter_multi_eps(g, s, R, EPS)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    g_gf = jax.grad(gf_loss, argnums=(0, 1))

    def gf_grad(g, s, salt):
        dg, ds = g_gf(g + salt.astype(g.dtype) * 0, s)
        return jnp.sum(dg.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    row("gf_grad", gf_grad, (guide, src))

    os.environ["PAIF_PALLAS_BOX_DIFF"] = "0"
    try:
        row("gf_grad_einsum", gf_grad, (guide, src))
    finally:
        os.environ["PAIF_PALLAS_BOX_DIFF"] = "1"

    # 5. the backward pass alone, on precomputed residuals
    _outs, res = jax.jit(
        lambda g, s: gf_mod._gf_forward(True, R, EPS, g, s, allow_pallas=False,
                                        diff_fused=True)
    )(guide, src)
    cots = tuple(jnp.ones_like(o) for o in _outs)

    def bwd_alone(res_, cots_, salt):
        res_ = (res_[0] + salt.astype(res_[0].dtype) * 0,) + tuple(res_[1:])
        dg, ds = gf_mod._gf_backward(True, R, EPS, res_, cots_)
        return jnp.sum(dg.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    row("gf_bwd_alone", bwd_alone, (res, cots))

    # 6. just the backward's box calls: fused group of 4 + group of 2
    # (src-width) + 2 guide-width dense boxes
    from paif_tpu.ops.pallas.box_filter import box_multi_packed_pallas

    gw = jnp.asarray(rng.uniform(0, 1, (B, HP, WP, 4)), jnp.float32)

    def bwd_boxes(s1, s2, s3, s4, g1, g2, salt):
        s1 = s1 + salt.astype(s1.dtype) * 0
        with packed_mode(True):
            q = box_multi_packed_pallas([s1, s2, s3, s4], R)
            p = box_multi_packed_pallas([s1 * s2, s3 * s4], R)
            b1 = box_filter_packed(g1, R, allow_pallas=False)
            b2 = box_filter_packed(g2, R, allow_pallas=False)
        acc = sum(jnp.sum(t.astype(jnp.float32)) for t in q + p)
        return acc + jnp.sum(b1) + jnp.sum(b2)

    row("bwd_boxes", bwd_boxes, (src, src, src, src, gw, gw))

    # 7. full in-context decompose (residue guide + GF + hf concat)
    def split_loss(x):
        with packed_mode(True):
            lf, hf = decompose(x, R, EPS)
        return jnp.sum(lf.astype(jnp.float32)) + jnp.sum(hf.astype(jnp.float32))

    def split_fwd(x, salt):
        return split_loss(x + salt.astype(x.dtype) * 0)

    g_split = jax.grad(split_loss)

    def split_grad(x, salt):
        return jnp.sum(g_split(x + salt.astype(x.dtype) * 0).astype(jnp.float32))

    row("decom_split_fwd", split_fwd, (src,))
    row("decom_split_grad", split_grad, (src,))

    print(f"\n== summary (ms, B{B}) ==", flush=True)
    for k, v in results.items():
        if v is not None:
            print(f"  {k:18s} {v:8.1f}")
    ba, bb = results.get("gf_bwd_alone"), results.get("bwd_boxes")
    if ba and bb:
        print(f"  bwd glue (alone - boxes): {ba - bb:.1f} ms")
    gg, fd = results.get("gf_grad"), results.get("gf_fwd_diff")
    if gg and fd:
        print(f"  bwd within grad (grad - fwd_diff): {gg - fd:.1f} ms")


if __name__ == "__main__":
    main()
