"""Isolated guided-filter A/B: round-3 fused multi-tensor Pallas boxes vs
the single-tensor Pallas boxes vs einsum-only, at the flagship Cell_Decom
shapes (packed guide (B,240,320,4) + src (B,240,320,128), r=4, two eps —
reference core/model_fusion_auto.py:522-535).

Steady-state method: slope of wall time vs chained in-jit reps (the ~122 ms
fixed dispatch+readback of the axon tunnel cancels in the difference).

Run: python scripts/bench_gf_fused.py [--batch 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("PAIF_PRECISION", "default")

import jax

if os.environ.get("PAIF_PLATFORM"):  # off-chip smoke: force a backend
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from paif_tpu.utils.jax_cache import configure_compile_cache


configure_compile_cache()


def slope_ms(fn, args, reps_lo=2, reps_hi=8, iters=3):
    """Steady-state ms/call: (t(reps_hi) - t(reps_lo)) / (hi - lo)."""

    def make(reps):
        def body(g, s):
            acc = jnp.float32(0)
            for _ in range(reps):
                outs = fn(g, s)
                t = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
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
    ap.add_argument(
        "--smoke",
        action="store_true",
        help="tiny shapes + CPU-friendly: validates the script plumbing "
        "off-chip (numbers are meaningless; interpret-mode Pallas)",
    )
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

    configs = [
        ("einsum only", {"PAIF_PALLAS_BOX": "0"}),
        ("pallas single (shipped)", {"PAIF_PALLAS_BOX": "1", "PAIF_FUSED_GF_BOX": "0"}),
        ("pallas fused K=2", {"PAIF_PALLAS_BOX": "1", "PAIF_FUSED_GF_BOX": "1"}),
        (
            "pallas fused K=4",
            {"PAIF_PALLAS_BOX": "1", "PAIF_FUSED_GF_BOX": "1", "PAIF_FUSED_GF_K": "4"},
        ),
        (
            "pallas fused per-scratch",
            {"PAIF_PALLAS_BOX": "1", "PAIF_FUSED_GF_BOX": "1", "PAIF_FUSED_GF_SCRATCH": "per"},
        ),
    ]
    for name, env in configs:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:

            def gf(gq, sq):
                with packed_mode(True):
                    return guided_filter_multi_eps(gq, sq, 4, (1e-3, 1e-4))

            ms = slope_ms(gf, (gp, xp))
            print(f"{name:26s} {ms:8.2f} ms/call", flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:110]}")
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
