"""Roofline decomposition of ONE PGD attack step (VERDICT r3 item 2).

The attack leg is bounded by: per PGD iteration the graph runs one joint
forward + one backward w.r.t. the two input images (+ encoder recompute
under remat). This script measures each piece as a steady-state SLOPE
(chained in-jit reps; the ~122 ms axon dispatch latency cancels):

  fwd        — joint forward, the bench.py headline program
  grad       — value_and_grad of the attack loss wrt (ir, vis), no remat
  grad_remat — same with full encoder remat (the shipped attack config)
  pgd1       — one full PGD step (grad + sign + project + clamp)

attack-leg bound = batch / (iters * grad_remat). Everything above that in
bench.py's attack row is loop overhead; the gap between `grad` and
`3x fwd` is the autodiff tax; `grad_remat - grad` is the remat recompute.
Reference hot loop being modeled: attack/attack.py:417-514 (attack_both).

Run: python scripts/bench_pgd_roofline.py [--batch 16] [--reps 3]
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


def slope(fn, args, reps, label):
    """Steady-state per-rep seconds via the reps-1 vs reps-R slope."""

    def chain(r):
        @jax.jit
        def body(*a):
            acc = jnp.float32(0)
            x = a[1]
            for i in range(r):
                t = fn(a[0], x, *a[2:])
                acc = acc + t
                x = x + (t * 0).astype(x.dtype)  # serialize
            return acc

        return body

    f1, fR = chain(1), chain(reps)
    t0 = time.perf_counter()
    float(f1(*args))
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    float(fR(*args))
    t1 = tR = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = min(t1 or 1e9, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fR(*args))
        tR = min(tR or 1e9, time.perf_counter() - t0)
    dt = (tR - t1) / (reps - 1)
    if dt <= 0:
        dt = t1
    print(f"{label}: {dt * 1e3:7.1f} ms steady-state", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    from paif_tpu.attack.pgd import AttackConfig, make_attack_both, seg_attack_loss
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    H, W = args.hw
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (args.batch, H, W, 1)), jnp.bfloat16)
    vis = jnp.asarray(rng.uniform(0, 1, (args.batch, H, W, 3)), jnp.bfloat16)
    label = jnp.asarray(rng.integers(0, 9, (args.batch, H, W)), jnp.int32)

    def build(remat):
        model = PAIFJoint(
            backbone="mit_b3",
            num_classes=9,
            fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
            remat=remat,
        )
        v = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 1), jnp.float32),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
        )
        bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )
        return model, dict(v, params=bf16(v["params"]))

    model, v = build(False)
    model_r, v_r = build(True)

    def fwd(vv, i, s):
        fused, seg = model.apply(vv, i, s)
        return jnp.sum(fused.astype(jnp.float32)) + jnp.sum(seg.astype(jnp.float32))

    def attack_loss(m):
        def loss(i, vv, s, lab):
            _, seg = m.apply(vv, i, s)
            return seg_attack_loss(seg, lab, "PGD", 0, 5)

        return loss

    def grad_fn(m):
        g = jax.grad(attack_loss(m), argnums=(0, 2))

        def run(vv, i, s, lab):
            d_i, d_s = g(i, vv, s, lab)
            return jnp.sum(d_i.astype(jnp.float32)) + jnp.sum(d_s.astype(jnp.float32))

        return run

    t_fwd = slope(fwd, (v, ir, vis), args.reps, "fwd       ")
    t_g = None
    try:
        t_g = slope(grad_fn(model), (v, ir, vis, label), args.reps, "grad      ")
    except Exception as e:
        print(f"grad (no remat): FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
    t_gr = slope(grad_fn(model_r), (v_r, ir, vis, label), args.reps, "grad_remat")

    atk = make_attack_both(lambda vv, i, s: model_r.apply(vv, i, s), AttackConfig(iters=1))

    def pgd1(vv, i, s, lab, key):
        d_ir, d_vis = atk(vv, i, s, lab, key)
        return jnp.sum(d_ir.astype(jnp.float32)) + jnp.sum(d_vis.astype(jnp.float32))

    key = jax.random.PRNGKey(0)
    t_p = slope(pgd1, (v_r, ir, vis, label, key), args.reps, "pgd1      ")

    b = args.batch
    print("\n== decomposition (batch", b, ") ==")
    print(f"fwd {t_fwd * 1e3:.1f} ms; grad_remat {t_gr * 1e3:.1f} ms "
          f"(= {t_gr / t_fwd:.2f}x fwd)")
    if t_g:
        print(f"autodiff tax: grad {t_g * 1e3:.1f} = {t_g / t_fwd:.2f}x fwd; "
              f"remat recompute {100 * (t_gr - t_g) / t_g:.1f}%")
    print(f"pgd step overhead above grad: {(t_p - t_gr) * 1e3:.1f} ms "
          f"({100 * (t_p - t_gr) / t_gr:.1f}%)")
    print(f"attack-leg bound at 5 iters: {b / (5 * t_gr):.2f} pairs/s "
          f"(grad only), measured-step bound {b / (5 * t_p):.2f}")


if __name__ == "__main__":
    main()
