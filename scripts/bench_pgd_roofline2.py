"""Roofline decomposition of ONE PGD attack step, v2 (VERDICT r3 item 2).

v1 (bench_pgd_roofline.py) chained reps by UNROLLING the grad body inside
one jit — XLA keeps both unrolled grads partially live and the chained
program OOMs at exactly the shapes that matter. v2 chains through
`lax.fori_loop` instead (same trick the attack itself uses): buffers are
reused across iterations, the ~122 ms axon dispatch latency still cancels
in the (R2 - R1)/(r2 - r1) slope, and every program fits.

Pieces measured at (batch, 480, 640) bf16, no remat:
  fwd          joint forward (the bench.py headline program)
  grad         d(attack_loss)/d(ir, vis) through the full joint model
  pgd_step     one full PGD iteration via make_attack_both iters r
  fusion_grad  d/d(ir, vis) of the fusion branch alone
  gf_grad      d/d(guide, src) of the two-eps guided filter alone (packed)
  enc_grad     d/d(rgb) of encoder+head alone

attack-leg bound = batch / (iters * grad). The gap between `grad` and
`3x fwd` is the autodiff tax; fusion_grad/enc_grad split it by branch.
Reference hot loop being modeled: attack/attack.py:417-514 (attack_both).

Run: python scripts/bench_pgd_roofline2.py [--batch 16] [--r1 1 --r2 3]
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
    """Steady-state per-iteration seconds via fori_loop rep counts r1 vs r2."""
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
    print(f"{label}: {dt * 1e3:7.1f} ms steady-state", flush=True)
    return dt


def looped(fn):
    """fn(*args, salt) -> scalar; returns maker of a jitted r-rep fori_loop.

    Everything (params included) is threaded as jit ARGUMENTS — closed-over
    device arrays become embedded HLO constants on this platform (30-min
    remote compiles + distorted steady state; see CLAUDE.md)."""

    def make(r):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return acc + fn(*args, acc * 0 + jnp.float32(i))

            return jax.lax.fori_loop(0, r, body, jnp.float32(0))

        return run

    return make


def safe(name, thunk):
    """One piece failing (e.g. a transient remote-compile HTTP 500) must not
    kill the rest of the decomposition — round-4 session-1 lost the tail of
    this table exactly that way."""
    try:
        return thunk()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--r1", type=int, default=1)
    ap.add_argument("--r2", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument(
        "--pieces",
        default=None,
        help="comma list to run (fwd,grad,pgd_step,fusion,gf_grad,enc_grad); default all",
    )
    args = ap.parse_args()
    pieces = set(args.pieces.split(",")) if args.pieces else None
    want = lambda k: pieces is None or k in pieces  # noqa: E731
    print(f"devices: {jax.devices()}", flush=True)

    from paif_tpu.attack.pgd import AttackConfig, make_attack_both, seg_attack_loss
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    H, W = args.hw
    B = args.batch
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.bfloat16)
    vis = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.bfloat16)
    label = jnp.asarray(rng.integers(0, 9, (B, H, W)), jnp.int32)

    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )

    model = PAIFJoint(
        backbone="mit_b3",
        num_classes=9,
        fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
        remat=False,
    )
    v = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    v = dict(v, params=bf16(v["params"]))

    results = {}

    # 1. forward
    def fwd(vv, i, s, salt):
        fused, seg = model.apply(vv, i + salt.astype(i.dtype) * 0, s)
        return jnp.sum(fused.astype(jnp.float32)) + jnp.sum(seg.astype(jnp.float32))

    if want("fwd"):
        results["fwd"] = safe("fwd", lambda: slope(looped(fwd), (v, ir, vis), args.r1, args.r2, "fwd       "))

    # 2. grad of the attack loss wrt inputs (the PGD inner computation)
    def attack_loss(vv, lab, i, s):
        _, seg = model.apply(vv, i, s)
        return seg_attack_loss(seg, lab, "PGD", 0, 5)

    g_inputs = jax.grad(attack_loss, argnums=(2, 3))

    def grad_fn(vv, lab, i, s, salt):
        di, ds = g_inputs(vv, lab, i + salt.astype(i.dtype) * 0, s)
        return jnp.sum(di.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    if want("grad"):
        results["grad"] = safe("grad", lambda: slope(looped(grad_fn), (v, label, ir, vis), args.r1, args.r2, "grad      "))

    # 3. one full PGD step (grad + sign + project + clamp), via the attack loop
    def pgd(r):
        atk = make_attack_both(lambda vv, i, s: model.apply(vv, i, s), AttackConfig(iters=r))

        @jax.jit
        def run(vv, i, s, lab):
            d_ir, d_vis = atk(vv, i, s, lab, jax.random.PRNGKey(0))
            return jnp.sum(d_ir.astype(jnp.float32)) + jnp.sum(d_vis.astype(jnp.float32))

        return run

    if want("pgd_step"):
        results["pgd_step"] = safe("pgd_step", lambda: slope(pgd, (v, ir, vis, label), 1, 5, "pgd_step  "))

    # 4. fusion branch alone
    fus = FusionNetSearched(32, PAIF_GENOTYPE)
    vf = jax.jit(fus.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 3))
    )
    vf = bf16(vf)

    def fus_loss(vv, i, s):
        return jnp.sum(fus.apply(vv, i, s).astype(jnp.float32))

    g_fus = jax.grad(fus_loss, argnums=(1, 2))

    def fus_grad(vv, i, s, salt):
        di, ds = g_fus(vv, i + salt.astype(i.dtype) * 0, s)
        return jnp.sum(di.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    if want("fusion"):
        results["fusion_grad"] = safe("fusion_grad", lambda: slope(looped(fus_grad), (vf, ir, vis), args.r1, args.r2, "fus_grad  "))

    def fus_fwd(vv, i, s, salt):
        return jnp.sum(fus.apply(vv, i + salt.astype(i.dtype) * 0, s).astype(jnp.float32))

    if want("fusion"):
        results["fusion_fwd"] = safe("fusion_fwd", lambda: slope(looped(fus_fwd), (vf, ir, vis), args.r1, args.r2, "fus_fwd   "))

    # 5. two-eps guided filter alone (flagship packed shapes)
    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import packed_mode

    guide = jnp.asarray(rng.uniform(0, 1, (B, H // 2, W // 2, 4)), jnp.bfloat16)
    src = jnp.asarray(rng.uniform(0, 1, (B, H // 2, W // 2, 128)), jnp.bfloat16)

    def gf_loss(g, s):
        with packed_mode():
            outs = guided_filter_multi_eps(g, s, 4, (1e-3, 1e-4))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    g_gf = jax.grad(gf_loss, argnums=(0, 1))

    def gf_grad(g, s, salt):
        dg, ds = g_gf(g + salt.astype(g.dtype) * 0, s)
        return jnp.sum(dg.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    if want("gf_grad"):
        results["gf_grad"] = safe("gf_grad", lambda: slope(looped(gf_grad), (guide, src), args.r1, args.r2, "gf_grad   "))

    # 6. encoder + head alone
    from paif_tpu.models.joint import SegFormer

    seg = SegFormer(backbone="mit_b3", num_classes=9)
    rgb = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.bfloat16)
    ve = bf16(jax.jit(seg.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))

    def enc_loss(vv, x):
        return jnp.sum(seg.apply(vv, x).astype(jnp.float32))

    g_enc = jax.grad(enc_loss, argnums=1)

    def enc_grad(vv, x, salt):
        return jnp.sum(g_enc(vv, x + salt.astype(x.dtype) * 0).astype(jnp.float32))

    if want("enc_grad"):
        results["enc_grad"] = safe("enc_grad", lambda: slope(looped(enc_grad), (ve, rgb), args.r1, args.r2, "enc_grad  "))

    print("\n== decomposition (ms, steady-state slope) ==", flush=True)
    for k, dt in results.items():
        if dt is not None:
            print(f"  {k:12s} {dt * 1e3:7.1f}", flush=True)
    f, g, p5 = results.get("fwd"), results.get("grad"), results.get("pgd_step")
    if p5:
        print(f"attack-leg bound = {B / (5 * p5):.2f} pairs/s at PGD-5", flush=True)
    if f and g:
        print(f"autodiff tax grad/fwd = {g / f:.2f}x", flush=True)
    if g and p5:
        print(f"pgd overhead/step = {(p5 - g) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
