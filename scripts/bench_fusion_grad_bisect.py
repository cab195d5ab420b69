"""Per-stage bisect of the fusion-branch backward tax (round-4 session 4).

roofline2: fusion_grad 426.7 ms vs fusion_fwd 102.1 (4.2x) at B16 480x640,
while conv_grad_s4 shows isolated packed convs have NO backward tax
(input-grad 1.07x fwd, chain 1.00x). So the tax is in a specific stage or
an interaction. Pieces, each fwd + input-grad slope at the packed flagship
shape (16,240,320,128) inside packed_mode:

  decom        CellDecom (2x decompose + 2x conv1x1 + chains normal_1/2)
  decom_nogf   same cell, decompose() monkeypatched to a zero-cost split —
               the difference vs `decom` is the GF's IN-CONTEXT cost
               (incl. custom-vjp fusion-barrier effects, not just its
               63.1 ms isolated grad)
  chain3       CellChain normal_3 alone
  gate         CrossModalSpatialGate alone (+ tile_gate mix)
  residue      the channel max-min guide (bwd = equality-mask scatter)

Sum-of-parts vs the measured whole tells whether the tax is a stage or
the composition. Run: python scripts/bench_fusion_grad_bisect.py
Smoke: PAIF_PLATFORM=cpu python scripts/bench_fusion_grad_bisect.py --smoke
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

    import paif_tpu.nn.cells as cells_mod
    from paif_tpu.genotype import PAIF_GENOTYPE as g
    from paif_tpu.nn.cells import CellChain, CellDecom, CrossModalSpatialGate, residue
    from paif_tpu.ops.packed import packed_mode, tile_gate_packed

    if args.smoke:
        B, HP, WP, C = 2, 16, 20, 8
    else:
        B, HP, WP, C = args.batch, 240, 320, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(0, 1, (B, HP, WP, 4 * C)), dt)
    xb = jnp.asarray(rng.normal(0, 1, (B, HP, WP, 4 * C)), dt)

    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    tiny_a = jnp.zeros((1, 8, 10, 4 * C), jnp.float32)

    def init_packed(mod, n_inputs):
        with packed_mode(True):
            v = jax.jit(mod.init)(jax.random.PRNGKey(0), *([tiny_a] * n_inputs))
        return bf16(v)

    results = {}

    def fwd_grad(name, mod, n_inputs, v):
        def apply_sum(vv, *xs):
            with packed_mode(True):
                out = mod.apply(vv, *xs)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in leaves)

        def f(vv, *rest):
            *xs, salt = rest
            xs = list(xs)
            xs[0] = xs[0] + salt.astype(xs[0].dtype) * 0
            return apply_sum(vv, *xs)

        grad_in = jax.grad(apply_sum, argnums=tuple(range(1, 1 + n_inputs)))

        def gfn(vv, *rest):
            *xs, salt = rest
            xs = list(xs)
            xs[0] = xs[0] + salt.astype(xs[0].dtype) * 0
            gs = grad_in(vv, *xs)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in gs)

        inputs = (xa, xb)[:n_inputs]
        results[name + "_fwd"] = safe(
            name, lambda: slope(looped(f), (v, *inputs), args.r1, args.r2, f"{name}_fwd ")
        )
        results[name + "_grad"] = safe(
            name, lambda: slope(looped(gfn), (v, *inputs), args.r1, args.r2, f"{name}_grad")
        )

    # 1. CellDecom (the decomposition stage: 2x GF split + convs + 2 chains)
    decom = CellDecom(C, g.ops("normal_1"), g.ops("normal_2"))
    fwd_grad("decom", decom, 2, init_packed(decom, 2))

    # 2. the same cell with the guided-filter split stubbed to a zero-cost
    # one (shapes preserved: LF = 0.75x repeated per eps, HF = 0.25x) — the
    # decom-minus-this difference is the GF's in-context cost.
    real_decompose = cells_mod.decompose

    def stub_decompose(x, radius=4, eps_list=(1e-3, 1e-4), remat=False):
        lf = jnp.concatenate([x * 0.75 for _ in eps_list], axis=-1)
        hf = jnp.concatenate([x * 0.25 for _ in eps_list], axis=-1)
        return lf, hf

    cells_mod.decompose = stub_decompose
    try:
        decom_ng = CellDecom(C, g.ops("normal_1"), g.ops("normal_2"))
        fwd_grad("decom_nogf", decom_ng, 2, init_packed(decom_ng, 2))
    finally:
        cells_mod.decompose = real_decompose

    # 3. normal_3 refinement chain alone
    chain3 = CellChain(C, g.ops("normal_3"))
    fwd_grad("chain3", chain3, 1, init_packed(chain3, 1))

    # 4. spatial gate (+ the packed tile mix it feeds)
    class GateMix(CrossModalSpatialGate):
        def __call__(self, ir, vis, train: bool = False):
            scale = super().__call__(ir, vis, train)
            scale = tile_gate_packed(scale, C)
            return scale * ir + (1.0 - scale) * vis

    gate = GateMix()
    fwd_grad("gate", gate, 2, init_packed(gate, 2))

    # 5. residue guide alone (channel max-min bwd = equality-mask scatter)
    def res_sum(x, salt):
        with packed_mode(True):
            return jnp.sum(residue(x + salt.astype(x.dtype) * 0).astype(jnp.float32))

    def res_grad(x, salt):
        with packed_mode(True):
            gr = jax.grad(
                lambda t: jnp.sum(residue(t).astype(jnp.float32))
            )(x + salt.astype(x.dtype) * 0)
        return jnp.sum(gr.astype(jnp.float32))

    results["residue_fwd"] = safe("residue", lambda: slope(looped(res_sum), (xa,), args.r1, args.r2, "residue_fwd "))
    results["residue_grad"] = safe("residue", lambda: slope(looped(res_grad), (xa,), args.r1, args.r2, "residue_grad"))

    print("\n== summary (ms, B%d) ==" % B, flush=True)
    for k, v in results.items():
        if v is not None:
            print(f"  {k:16s} {v:8.1f}")
    dv = results.get("decom_grad")
    dn = results.get("decom_nogf_grad")
    if dv and dn:
        print(f"  GF in-context grad cost: {dv - dn:.1f} ms (isolated gf_grad was 63.1)")


if __name__ == "__main__":
    main()
