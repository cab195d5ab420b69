"""Bisect the winograd-vs-scattered f32 parity gap seen ONLY on TPU
(bench_logs/r4/winograd_s3.log: 1.6e-2 after the einsum-precision fix;
CPU err is 2.4e-6). Computes both sides on the TPU backend and compares
each against the CPU backend's f32 result to find which side diverges.

Run: python scripts/debug_winograd_parity.py
"""

import os
import sys

sys.path.insert(0, ".")
os.environ["PAIF_PRECISION"] = "highest"

import jax
import jax.numpy as jnp
import numpy as np

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

sys.path.insert(0, "scripts")
from bench_winograd import conv_same_packed, pack, unpack, winograd_packed  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    x = np.asarray(rng.normal(0, 1, (2, 16, 20, 8)), np.float32)
    w = np.asarray(rng.normal(0, 0.3, (3, 3, 8, 8)), np.float32)

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    results = {}
    for name, fn in (("conv", conv_same_packed), ("wino", winograd_packed)):
        outs = {}
        for devname, dev in (("cpu", cpu), ("tpu", tpu)):
            with jax.default_device(dev):
                xp = pack(jnp.asarray(x))
                out = jax.jit(fn)(xp, jnp.asarray(w))
                outs[devname] = np.asarray(unpack(out), np.float32)
        results[name] = outs
        err = np.abs(outs["tpu"] - outs["cpu"]).max()
        print(f"{name}: tpu-vs-cpu max abs err {err:.2e}", flush=True)

    cross_cpu = np.abs(results["conv"]["cpu"] - results["wino"]["cpu"]).max()
    cross_tpu = np.abs(results["conv"]["tpu"] - results["wino"]["tpu"]).max()
    print(f"conv-vs-wino: cpu {cross_cpu:.2e}  tpu {cross_tpu:.2e}", flush=True)


if __name__ == "__main__":
    main()
