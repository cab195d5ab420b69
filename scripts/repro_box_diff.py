"""Isolate the PAIF_PALLAS_BOX_DIFF compile failure (round-4 campaign:
`bench_pgd --env PAIF_PALLAS_BOX_DIFF=1,PAIF_FUSED_GF_BOX=1` died in the
remote compile helper with an opaque HTTP 500).

Escalation ladder — each stage jits + runs a strictly bigger slice of the
attack graph with the fused boxes in the DIFFERENTIATED path, printing the
full exception so the real Mosaic/XLA message surfaces:
  1. grad of the two-eps guided filter alone (flagship packed shape)
  2. grad of one Cell_Decom decomposition (adds packing + residue guide)
  3. grad of the full fusion branch
  4. one PGD step of the full joint model (batch configurable)

Run: python scripts/repro_box_diff.py [--stage N] [--batch 16]
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, ".")
os.environ.setdefault("PAIF_PRECISION", "default")
os.environ["PAIF_PALLAS_BOX_DIFF"] = os.environ.get("PAIF_PALLAS_BOX_DIFF", "1")
os.environ["PAIF_FUSED_GF_BOX"] = os.environ.get("PAIF_FUSED_GF_BOX", "1")

import jax

if os.environ.get("PAIF_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

import jax.numpy as jnp
import numpy as np


def run(name, fn):
    print(f"--- {name} ---", flush=True)
    try:
        out = fn()
        print(f"{name}: OK  checksum={out:.4f}", flush=True)
        return True
    except Exception:
        print(f"{name}: FAILED", flush=True)
        traceback.print_exc()
        tb = traceback.format_exc()
        for line in tb.splitlines():
            if any(k in line for k in ("Mosaic", "mosaic", "vmem", "VMEM", "INTERNAL")):
                print("!!", line, flush=True)
        return False


def stage1(batch):
    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import packed_mode

    rng = np.random.default_rng(0)
    guide = jnp.asarray(rng.uniform(0, 1, (batch, 240, 320, 4)), jnp.bfloat16)
    src = jnp.asarray(rng.uniform(0, 1, (batch, 240, 320, 128)), jnp.bfloat16)

    @jax.jit
    def loss(g, s):
        with packed_mode():
            outs = guided_filter_multi_eps(g, s, 4, (1e-3, 1e-4))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    d0, d1 = g(guide, src)
    return float(jnp.sum(d0.astype(jnp.float32)) + jnp.sum(d1.astype(jnp.float32)))


def _fusion_model():
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched

    return FusionNetSearched(32, PAIF_GENOTYPE)


def stage3(batch):
    model = _fusion_model()
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (batch, 480, 640, 1)), jnp.bfloat16)
    vis = jnp.asarray(rng.uniform(0, 1, (batch, 480, 640, 3)), jnp.bfloat16)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 3)))
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    v = bf16(v)

    def loss(i, s):
        return jnp.sum(model.apply(v, i, s).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    d0, d1 = g(ir, vis)
    return float(jnp.sum(d0.astype(jnp.float32)) + jnp.sum(d1.astype(jnp.float32)))


def stage4(batch):
    from paif_tpu.attack.pgd import AttackConfig, make_attack_both
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    model = PAIFJoint(
        backbone="mit_b3",
        num_classes=9,
        fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
        remat=True,
    )
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (batch, 480, 640, 1)), jnp.bfloat16)
    vis = jnp.asarray(rng.uniform(0, 1, (batch, 480, 640, 3)), jnp.bfloat16)
    label = jnp.asarray(rng.integers(0, 9, (batch, 480, 640)), jnp.int32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 3)))
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    v = dict(v, params=bf16(v["params"]))
    atk = make_attack_both(lambda vv, i, s: model.apply(vv, i, s), AttackConfig(iters=1))
    d_ir, d_vis = atk(v, ir, vis, label, jax.random.PRNGKey(0))
    return float(jnp.sum(d_ir.astype(jnp.float32)) + jnp.sum(d_vis.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0, help="0 = all until failure")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    stages = {
        1: lambda: stage1(args.batch),
        3: lambda: stage3(args.batch),
        4: lambda: stage4(args.batch),
    }
    if args.stage:
        run(f"stage{args.stage}", stages[args.stage])
        return
    for k in sorted(stages):
        if not run(f"stage{k}", stages[k]):
            break


if __name__ == "__main__":
    main()
