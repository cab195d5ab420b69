"""Can cell-granular remat buy back the scheduling gap? (round-5 session 1)

prefix2 established: the fusion backward runs ~213 ms faster when XLA can
interleave each stage's backward with its forward (cotangent available
early, P1data 148.6) than in the real fwd-then-bwd regime (P2sg 361.6) —
same ops, same shapes. The real attack graph is always in the slow regime
(the cotangent comes from the seg loss at the end of the joint forward).

jax.checkpoint around CellDecom recreates the interleaved pattern inside
the backward: the recomputed decom forward sits adjacent to its own
backward. Cost: +~70 ms of recompute. Prize: up to ~213 ms of schedule.
Round 4 only ever rematted the ENCODER blocks and the GF split — never the
fusion cells.

Rows:
  P2sg            re-anchor (expect ~362)
  P2sg_remat      CellDecom wrapped in nn.remat
  P2_remat        same but with real gate gradients (expect ~+17)
  full_remat      the full branch (P4) with remat around decom + chain3

Run: python scripts/bench_fusion_prefix3.py
Smoke: PAIF_PLATFORM=cpu python scripts/bench_fusion_prefix3.py --smoke
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
    from paif_tpu.nn.cells import CellChain, CellDecom, CrossModalSpatialGate
    from paif_tpu.nn.layers import Conv, PReLU
    from paif_tpu.ops.packed import pack, packed_mode, tile_gate_packed, unpack

    if args.smoke:
        B, H, W, c = 2, 32, 40, 8
    else:
        B, H, W, c = args.batch, 480, 640, 32

    class Body(nn.Module):
        mode: str  # 'p2sg' | 'p2sg_remat' | 'p2_remat' | 'full_remat'
        feats: int

        @nn.compact
        def __call__(self, ir, vis):
            cc = self.feats
            remat = self.mode.endswith("_remat")
            Decom = nn.remat(CellDecom, static_argnums=(3,)) if remat else CellDecom
            ir = pack(ir[..., 0:1])
            vis = pack(vis[..., 0:1])
            with packed_mode(True):
                fir = PReLU(name="stem_1_act")(Conv(cc, 3, name="stem_1")(ir))
                fvis = PReLU(name="stem_2_act")(Conv(cc, 3, name="stem_2")(vis))
                ir_f, vis_f = Decom(
                    cc, g.ops("normal_1"), g.ops("normal_2"), name="decompation"
                )(fir, fvis, False)
                scale = CrossModalSpatialGate(name="spa")(ir_f, vis_f, False)
                scale = tile_gate_packed(scale, cc)
                if self.mode.startswith("p2sg"):
                    scale = jax.lax.stop_gradient(scale)
                agg = scale * ir_f + (1.0 - scale) * vis_f
                if self.mode != "full_remat":
                    return (agg,)
                Chain = nn.remat(CellChain, static_argnums=(2,))
                refined = Chain(cc, g.ops("normal_3"), name="chain")(agg, False)
                out = Conv(cc // 2, 3, name="stem_out_0")(refined)
                out = Conv(1, 3, name="stem_out_1")(out)
                out = PReLU(name="stem_out_act")(out)
            return (jnp.tanh(unpack(out)),)

    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.bfloat16)
    vis = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.bfloat16)
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )

    results = {}
    for mode in ("p2sg", "p2sg_remat", "p2_remat", "full_remat"):
        mod = Body(mode, c)
        v = bf16(
            jax.jit(mod.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 40, 1), jnp.float32),
                jnp.zeros((1, 32, 40, 3), jnp.float32),
            )
        )

        def loss(vv, i, s, mod=mod):
            outs = mod.apply(vv, i, s)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        grad = jax.grad(loss, argnums=(1, 2))

        def gfn(vv, i, s, salt, grad=grad):
            di, ds = grad(vv, i + salt.astype(i.dtype) * 0, s)
            return jnp.sum(di.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

        results[mode] = safe(
            mode, lambda: slope(looped(gfn), (v, ir, vis), args.r1, args.r2, f"{mode:12s}")
        )

    print(f"\n== summary (grad ms, B{B}) ==", flush=True)
    for k, v in results.items():
        if v is not None:
            print(f"  {k:14s} {v:8.1f}")


if __name__ == "__main__":
    main()
