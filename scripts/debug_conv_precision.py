"""Minimal probe: does XLA:TPU honor precision=HIGHEST for f32
conv_general_dilated on this stack? (winograd_debug.log showed the packed
scattered conv off CPU by 1.6e-2 in 'highest' mode — single-pass-bf16
magnitude — while the einsum-built winograd path matched to 1.7e-6.)

Run: python scripts/debug_conv_precision.py
"""

import sys

sys.path.insert(0, ".")

import jax

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    x = np.asarray(rng.normal(0, 1, (2, 16, 20, 8)), np.float32)
    w = np.asarray(rng.normal(0, 0.3, (3, 3, 8, 8)), np.float32)

    def conv(prec):
        def f(xx, ww):
            return jax.lax.conv_general_dilated(
                xx, ww, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
            )
        return jax.jit(f)

    def dot_equiv(prec):
        # same contraction as an einsum over extracted patches (known to
        # honor precision): gather 3x3 patches then one dot
        def f(xx, ww):
            pads = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
            pat = jnp.stack(
                [pads[:, i : i + 16, j : j + 20, :] for i in range(3) for j in range(3)],
                axis=-2,
            )  # (B,H,W,9,C)
            return jnp.einsum(
                "bhwkc,kco->bhwo", pat, ww.reshape(9, 8, 8), precision=prec
            )
        return jax.jit(f)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = np.asarray(conv(jax.lax.Precision.HIGHEST)(jnp.asarray(x), jnp.asarray(w)))

    for name, mk in (("conv", conv), ("patch-einsum", dot_equiv)):
        for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST):
            out = np.asarray(mk(prec)(jnp.asarray(x), jnp.asarray(w)))
            print(f"{name:14s} {str(prec):20s} max abs err vs cpu-f32: "
                  f"{np.abs(out - ref).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
