"""Fusion-branch A/B of the round-3 GF changes, amortized (reps inside jit).

Configs: baseline (all round-3 toggles on), decom stacking off, dense-lane
guide boxes off, Pallas box off. Env flags are read at TRACE time, so one
process can flip them between jit builds.

Run: python scripts/bench_fusion_ab.py [--batch 16] [--reps 20]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    B, reps = args.batch, args.reps

    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    ir = jnp.asarray(rng.uniform(0, 1, (B, 480, 640, 1)), dt)
    vis = jnp.asarray(rng.uniform(0, 1, (B, 480, 640, 3)), dt)
    fusion = FusionNetSearched(32, PAIF_GENOTYPE)
    fv = fusion.init(jax.random.PRNGKey(0), ir[:1, :64, :64], vis[:1, :64, :64])
    fv = jax.tree_util.tree_map(lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, fv)

    print(f"devices: {jax.devices()}  B={B} reps={reps}", flush=True)

    configs = [
        ("all-on (shipped)", {}),
        ("decom stack off", {"PAIF_DECOM_STACK": "0"}),
        ("dense guide off", {"PAIF_GF_DENSE_GUIDE": "0"}),
        ("pallas box off", {"PAIF_PALLAS_BOX": "0"}),
        ("stack+dense off", {"PAIF_DECOM_STACK": "0", "PAIF_GF_DENSE_GUIDE": "0"}),
        ("fused GF boxes", {"PAIF_FUSED_GF_BOX": "1"}),
        ("fused GF boxes K=4", {"PAIF_FUSED_GF_BOX": "1", "PAIF_FUSED_GF_K": "4"}),
        ("fused + decom stack", {"PAIF_FUSED_GF_BOX": "1", "PAIF_DECOM_STACK": "1"}),
    ]
    for name, env in configs:
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v

        def body(v, i, s):
            acc = jnp.float32(0)
            for _ in range(reps):
                out = fusion.apply(v, i, s)
                t = jnp.sum(out.astype(jnp.float32))
                acc = acc + t
                i = i + (t * 0).astype(i.dtype)
            return acc

        red = jax.jit(body)
        try:
            float(red(fv, ir, vis))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(red(fv, ir, vis))
                ts.append(time.perf_counter() - t0)
            print(f"{name:24s} {min(ts) / reps * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:100]}")
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
