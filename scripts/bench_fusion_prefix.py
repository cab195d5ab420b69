"""Prefix bisect of the fusion-branch backward (round-5 session 1).

bench_fusion_boundary.py showed the pack/unpack io boundary costs ~nothing
in context (fus_grad 426.1 vs packed-io 424.7), yet the sum of isolated
stage grads (~290 ms incl. stems/head estimates) is ~140 ms short of the
whole. This measures grad slopes of PREFIXES of the real body, so each
stage's marginal cost is measured IN CONTEXT (with its true producers and
consumers in the graph):

  P0  stems (2x conv3 + PReLU, packed)
  P1  P0 + CellDecom (the GF decomposition cell)
  P2  P1 + cross-modal gate + mix
  P3  P2 + chain3 refinement
  P4  P3 + out head + unpack + tanh  (== the full branch; sanity ~426)

Run: python scripts/bench_fusion_prefix.py
Smoke: PAIF_PLATFORM=cpu python scripts/bench_fusion_prefix.py --smoke
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

    class Prefix(nn.Module):
        stop: int  # 0 stems, 1 +decom, 2 +gate/mix, 3 +chain3, 4 full
        feats: int

        @nn.compact
        def __call__(self, ir, vis):
            cc = self.feats
            ir = pack(ir[..., 0:1])
            vis = pack(vis[..., 0:1])
            with packed_mode(True):
                fir = PReLU(name="stem_1_act")(Conv(cc, 3, name="stem_1")(ir))
                fvis = PReLU(name="stem_2_act")(Conv(cc, 3, name="stem_2")(vis))
                if self.stop == 0:
                    return fir, fvis
                ir_f, vis_f = CellDecom(
                    cc, g.ops("normal_1"), g.ops("normal_2"), name="decompation"
                )(fir, fvis, False)
                if self.stop == 1:
                    return ir_f, vis_f
                scale = CrossModalSpatialGate(name="spa")(ir_f, vis_f, False)
                scale = tile_gate_packed(scale, cc)
                agg = scale * ir_f + (1.0 - scale) * vis_f
                if self.stop == 2:
                    return (agg,)
                refined = CellChain(cc, g.ops("normal_3"), name="chain")(agg, False)
                if self.stop == 3:
                    return (refined,)
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
    for stop in range(5):
        mod = Prefix(stop, c)
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

        def ffn(vv, i, s, salt, loss=loss):
            return loss(vv, i + salt.astype(i.dtype) * 0, s)

        results[f"P{stop}_fwd"] = safe(
            f"P{stop}_fwd", lambda: slope(looped(ffn), (v, ir, vis), args.r1, args.r2, f"P{stop}_fwd ")
        )
        results[f"P{stop}_grad"] = safe(
            f"P{stop}_grad", lambda: slope(looped(gfn), (v, ir, vis), args.r1, args.r2, f"P{stop}_grad")
        )

    print(f"\n== summary (ms, B{B}) ==", flush=True)
    prev_f = prev_g = 0.0
    names = ["stems", "+decom", "+gate/mix", "+chain3", "+head(full)"]
    for stop in range(5):
        f, gr = results.get(f"P{stop}_fwd"), results.get(f"P{stop}_grad")
        if f is None or gr is None:
            continue
        print(
            f"  P{stop} {names[stop]:12s} fwd {f:7.1f} (+{f - prev_f:6.1f})   "
            f"grad {gr:7.1f} (+{gr - prev_g:6.1f})"
        )
        prev_f, prev_g = f, gr


if __name__ == "__main__":
    main()
