"""On-chip flagship-resolution f32 parity spot-check (VERDICT r3 item 6).

Torch parity runs at small sizes on CPU; this closes the loop at eval
resolution: the joint forward (searched fusion + mit_b3) at 480x640 under
PAIF_PRECISION=highest, same weights and inputs, TPU vs the CPU JAX
reference path — recording max-abs-diff of the fused image and the seg
logits. Mosaic bf16 sublane miscompiles (docs/MOSAIC.md) are exactly the
bug class this catches. Parity target in the reference workflow:
core/model_fusion_auto.py:1043-1060 (CompModel forward).

Run:  python scripts/check_f32_parity.py           # spawns the CPU phase,
                                                   # then diffs on the chip
      python scripts/check_f32_parity.py --phase cpu --out /tmp/parity.npz
      python scripts/check_f32_parity.py --phase tpu --ref /tmp/parity.npz
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, ".")
os.environ["PAIF_PRECISION"] = "highest"  # f32 parity path

import numpy as np

REF = "/tmp/paif_f32_parity.npz"
H, W = 480, 640


def _model_and_inputs():
    import jax
    import jax.numpy as jnp

    from paif_tpu.utils.jax_cache import configure_compile_cache
    configure_compile_cache()

    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    model = PAIFJoint(
        backbone="mit_b3",
        num_classes=9,
        fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    fwd = jax.jit(model.apply)
    return fwd, variables, ir, vis


def run_phase(out_or_ref: str, diff: bool) -> None:
    import jax

    if os.environ.get("PAIF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
    print(f"devices: {jax.devices()}", flush=True)
    fwd, variables, ir, vis = _model_and_inputs()
    fused, seg = fwd(variables, ir, vis)
    fused, seg = np.asarray(fused, np.float32), np.asarray(seg, np.float32)
    if not diff:
        np.savez(out_or_ref, fused=fused, seg=seg)
        print(f"saved reference outputs to {out_or_ref}", flush=True)
        return
    ref = np.load(out_or_ref)
    d_f = float(np.max(np.abs(fused - ref["fused"])))
    d_s = float(np.max(np.abs(seg - ref["seg"])))
    rel_s = d_s / float(np.max(np.abs(ref["seg"])) + 1e-12)
    print(
        f"f32 parity @ {H}x{W} (PAIF_PRECISION=highest):\n"
        f"  fused max-abs-diff = {d_f:.3e}  (range [0,1])\n"
        f"  seg logits max-abs-diff = {d_s:.3e}  (rel {rel_s:.3e})",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["cpu", "tpu", "both"], default="both")
    ap.add_argument("--out", default=REF)
    ap.add_argument("--ref", default=REF)
    args = ap.parse_args()
    if args.phase == "cpu":
        run_phase(args.out, diff=False)
    elif args.phase == "tpu":
        run_phase(args.ref, diff=True)
    else:
        env = dict(os.environ, PAIF_PLATFORM="cpu")
        subprocess.run(
            [sys.executable, __file__, "--phase", "cpu", "--out", args.out],
            check=True,
            env=env,
        )
        run_phase(args.ref, diff=True)


if __name__ == "__main__":
    main()
