"""Discriminate WHY the gate/mix stage adds 230 ms of backward (round 5).

bench_fusion_prefix.py: P1 (stems+decom) grad 148.4, P2 (+gate/mix) 378.2.
Two competing explanations:
  (a) sum() losses give literal-ones output cotangents, so P1's decom
      backward partially CONSTANT-FOLDS (e.g. box(inv_n_x) is a box of a
      compile-time constant) — P2's data cotangents just measure the real
      cost, and every earlier sum-loss bisect row was an underestimate;
  (b) the gate backward path (channel-pool equality scatters + conv) or its
      scheduling interaction genuinely costs 200+ ms in context.

Rows:
  P1        stems+decom, sum loss            (prefix re-check, ~148)
  P1data    stems+decom, sum(out * runtime)  (real cotangents, no gate)
  P2        +gate/mix, sum loss              (re-check, ~378)
  P2sg      +gate/mix with stop_gradient(scale) (mix cotangents data =
            scale, but NO gate backward path)
  gf_data   isolated 2-eps GF grad, weighted-sum loss (vs 62.7 sum-loss)

If P1data ~ P2 and gf_data >> 62.7 -> (a): the GF backward itself is the
whole story and its true in-context cost is ~330 ms of the 426.
Run: python scripts/bench_fusion_prefix2.py
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
from flax import linen as nn


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

    from paif_tpu.genotype import PAIF_GENOTYPE as g
    from paif_tpu.nn.cells import CellDecom, CrossModalSpatialGate
    from paif_tpu.nn.layers import Conv, PReLU
    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import pack, packed_mode, tile_gate_packed

    if args.smoke:
        B, H, W, c = 2, 32, 40, 8
    else:
        B, H, W, c = args.batch, 480, 640, 32

    class Prefix(nn.Module):
        mode: str  # 'p1', 'p2', 'p2sg'
        feats: int

        @nn.compact
        def __call__(self, ir, vis):
            cc = self.feats
            ir = pack(ir[..., 0:1])
            vis = pack(vis[..., 0:1])
            with packed_mode(True):
                fir = PReLU(name="stem_1_act")(Conv(cc, 3, name="stem_1")(ir))
                fvis = PReLU(name="stem_2_act")(Conv(cc, 3, name="stem_2")(vis))
                ir_f, vis_f = CellDecom(
                    cc, g.ops("normal_1"), g.ops("normal_2"), name="decompation"
                )(fir, fvis, False)
                if self.mode == "p1":
                    return ir_f, vis_f
                scale = CrossModalSpatialGate(name="spa")(ir_f, vis_f, False)
                scale = tile_gate_packed(scale, cc)
                if self.mode == "p2sg":
                    scale = jax.lax.stop_gradient(scale)
                agg = scale * ir_f + (1.0 - scale) * vis_f
            return (agg,)

    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.bfloat16)
    vis = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.bfloat16)
    HP, WP = H // 2, W // 2
    wmul = jnp.asarray(rng.uniform(0.5, 1.5, (B, HP, WP, 4 * c)), jnp.bfloat16)
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )

    results = {}

    def grad_row(name, mod, weighted):
        v = bf16(
            jax.jit(mod.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 40, 1), jnp.float32),
                jnp.zeros((1, 32, 40, 3), jnp.float32),
            )
        )

        def loss(vv, i, s, wm):
            outs = mod.apply(vv, i, s)
            if weighted:
                return sum(jnp.sum((o * wm).astype(jnp.float32)) for o in outs)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        grad = jax.grad(loss, argnums=(1, 2))

        def gfn(vv, i, s, wm, salt):
            di, ds = grad(vv, i + salt.astype(i.dtype) * 0, s, wm)
            return jnp.sum(di.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

        results[name] = safe(
            name, lambda: slope(looped(gfn), (v, ir, vis, wmul), args.r1, args.r2, f"{name:8s}")
        )

    grad_row("P1", Prefix("p1", c), False)
    grad_row("P1data", Prefix("p1", c), True)
    grad_row("P2", Prefix("p2", c), False)
    grad_row("P2sg", Prefix("p2sg", c), False)

    # isolated GF grad with data cotangents
    guide = jnp.asarray(rng.uniform(0, 1, (B, HP, WP, 4)), jnp.bfloat16)
    src = jnp.asarray(rng.uniform(0, 1, (B, HP, WP, 4 * c)), jnp.bfloat16)

    def gf_loss(gd, s, wm):
        with packed_mode(True):
            outs = guided_filter_multi_eps(gd, s, 4, (1e-3, 1e-4))
        return sum(jnp.sum((o * wm).astype(jnp.float32)) for o in outs)

    g_gf = jax.grad(gf_loss, argnums=(0, 1))

    def gf_data(gd, s, wm, salt):
        dg, ds = g_gf(gd + salt.astype(gd.dtype) * 0, s, wm)
        return jnp.sum(dg.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    results["gf_data"] = safe(
        "gf_data", lambda: slope(looped(gf_data), (guide, src, wmul), args.r1, args.r2, "gf_data ")
    )

    print(f"\n== summary (ms, B{B}) ==", flush=True)
    for k, v in results.items():
        if v is not None:
            print(f"  {k:10s} {v:8.1f}")


if __name__ == "__main__":
    main()
