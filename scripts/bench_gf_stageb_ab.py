"""A/B for the stage-B VMEM fold (PAIF_FUSED_GF_STAGEB) and the backward
pre-product fold (PAIF_FUSED_GF_PROD): isolated two-eps guided filter at the
flagship Cell_Decom shapes, primal forward and fwd+bwd grad.

The per-eps (a, b) coefficients and the backward's cotangent pre-products
are four src-width HBM temps each (315 MB at B16 packed flagship); the
folds form them inside the fused box kernels' VMEM instead
(ops/pallas/box_filter.py _stageb_kernel / _gated_h_pass).

Run: python scripts/bench_gf_stageb_ab.py [--batch 16]
Smoke: PAIF_PLATFORM=cpu python scripts/bench_gf_stageb_ab.py --smoke
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

import jax.numpy as jnp
import numpy as np

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()


def slope_ms(fn, args, reps_lo=2, reps_hi=8, iters=3):
    def make(reps):
        def body(g, s):
            acc = jnp.float32(0)
            for _ in range(reps):
                t = fn(g, s)
                acc = acc + t
                s = s + (t * 0).astype(s.dtype)
            return acc

        return jax.jit(body)

    lo, hi = make(reps_lo), make(reps_hi)
    float(lo(*args)), float(hi(*args))
    tlo = thi = None
    for _ in range(iters):
        t0 = time.perf_counter()
        float(lo(*args))
        tlo = min(tlo or 1e9, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(hi(*args))
        thi = min(thi or 1e9, time.perf_counter() - t0)
    return (thi - tlo) / (reps_hi - reps_lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    B = 2 if args.smoke else args.batch
    hw = (64, 96) if args.smoke else (480, 640)

    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import pack, packed_mode

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.uniform(0, 1, (B, *hw, 32)), dt)
    g = (jnp.max(x, -1, keepdims=True) - jnp.min(x, -1, keepdims=True)).astype(dt)
    xp, gp = pack(x), pack(g)
    print(f"devices: {jax.devices()}  B={B} src {xp.shape}", flush=True)

    def fwd(gq, sq):
        with packed_mode(True):
            outs = guided_filter_multi_eps(gq, sq, 4, (1e-3, 1e-4))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    grad = jax.grad(lambda gq, sq: fwd(gq, sq), argnums=(0, 1))

    def gfn(gq, sq):
        dg, ds = grad(gq, sq)
        return jnp.sum(dg.astype(jnp.float32)) + jnp.sum(ds.astype(jnp.float32))

    rows = [
        ("fwd  stageb=0", fwd, {"PAIF_FUSED_GF_STAGEB": "0"}),
        ("fwd  stageb=1", fwd, {"PAIF_FUSED_GF_STAGEB": "1"}),
        ("grad prod=0 stageb=0", gfn, {"PAIF_FUSED_GF_PROD": "0", "PAIF_FUSED_GF_STAGEB": "0"}),
        ("grad prod=1 stageb=0", gfn, {"PAIF_FUSED_GF_PROD": "1", "PAIF_FUSED_GF_STAGEB": "0"}),
        ("grad prod=1 stageb=1", gfn, {"PAIF_FUSED_GF_PROD": "1", "PAIF_FUSED_GF_STAGEB": "1"}),
    ]
    for name, fn, env in rows:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            ms = slope_ms(fn, (gp, xp))
            print(f"{name:24s} {ms:8.2f} ms/call", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:110]}")
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
