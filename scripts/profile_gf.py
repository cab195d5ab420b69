"""Guided-filter internals on the real chip: where do the ~78 ms (B16) go?

Times, at the flagship packed shapes (B,240,320,128) src + (B,240,320,4)
guide, r=4, two eps (the Cell_Decom decomposition configuration,
reference core/model_fusion_auto.py:522-535):
  * full guided_filter_multi_eps primal (Pallas boxes) and einsum-only
  * the guide-moment subgraph alone (n, mean_g, var_g — 4-lane matmul boxes)
  * one Pallas box at src width; the 6-box chain
  * elementwise remainder (derived)

Run: python scripts/profile_gf.py [--batch 16]
"""

import argparse
import sys

sys.path.insert(0, ".")
import os
import time

os.environ.setdefault("PAIF_PRECISION", "default")

import jax

if os.environ.get("PAIF_PLATFORM"):  # off-chip smoke: force a backend
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from paif_tpu.utils.jax_cache import configure_compile_cache
configure_compile_cache()


def timeit(name, fn, *args, iters=4, reps_lo=2, reps_hi=7):
    """Steady-state ms/call via the reps slope (total/reps carries
    ~(fixed dispatch)/reps ms of bias — CLAUDE.md round-3 method)."""

    def make(reps):
        def body(*a):
            acc = jnp.float32(0)
            x = a[0]
            for _ in range(reps):
                out = fn(x, *a[1:])
                s = sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(out))
                acc = acc + s
                x = x + (s * 0).astype(x.dtype)
            return acc

        return jax.jit(body)

    lo, hi = make(reps_lo), make(reps_hi)
    try:
        float(lo(*args)), float(hi(*args))
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:120]}")
        return None
    tlo = thi = None
    for _ in range(iters):
        t0 = time.perf_counter()
        float(lo(*args))
        tlo = min(tlo or 1e9, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(hi(*args))
        thi = min(thi or 1e9, time.perf_counter() - t0)
    ms = (thi - tlo) / (reps_hi - reps_lo) * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch

    from paif_tpu.ops.guided_filter import _gf_forward, guided_filter_multi_eps
    from paif_tpu.ops.packed import box_filter_packed, packed_mode, tile_gate_packed
    from paif_tpu.ops.pallas.box_filter import box_filter_packed_pallas

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    hp, wp = 240, 320
    src = jnp.asarray(rng.uniform(0, 1, (B, hp, wp, 128)), dt)
    guide = jnp.asarray(rng.uniform(0, 1, (B, hp, wp, 4)), dt)
    eps = (1e-3, 1e-4)

    print(f"devices: {jax.devices()}  B={B}", flush=True)

    def gf_full(g, s):
        with packed_mode(True):
            return guided_filter_multi_eps(g, s, 4, eps)

    def gf_einsum(g, s):
        with packed_mode(True):
            return _gf_forward(True, 4, eps, g, s, allow_pallas=False)[0]

    def guide_moments(g, s):
        with packed_mode(True):
            g32 = g.astype(jnp.float32)
            n = box_filter_packed(jnp.ones((1, hp, wp, 4), jnp.float32), 4)
            inv_n = 1.0 / n
            mean_g = box_filter_packed(g32, 4) * inv_n
            var_g = box_filter_packed(g32 * g32, 4) * inv_n - mean_g * mean_g
            return mean_g, var_g

    def guide_moments_wide(g, s):
        # alternative: widen guide to 128 lanes first, Pallas-box the moments
        with packed_mode(True):
            gw = tile_gate_packed(g, 32).astype(jnp.float32)
            n = box_filter_packed(jnp.ones((1, hp, wp, 4), jnp.float32), 4)
            inv_n = tile_gate_packed(1.0 / n, 32)
            mean_g = box_filter_packed_pallas(gw, 4) * inv_n
            var_g = box_filter_packed_pallas(gw * gw, 4) * inv_n - mean_g * mean_g
            return mean_g, var_g

    def box1(s, g):
        return box_filter_packed_pallas(s, 4)

    def boxn_pallas(n):
        def f(s, g):
            return [box_filter_packed_pallas(s + jnp.float32(i).astype(s.dtype), 4) for i in range(n)]

        return f

    def boxn_einsum(n):
        def f(s, g):
            with packed_mode(True):
                return [
                    box_filter_packed(s + jnp.float32(i).astype(s.dtype), 4, allow_pallas=False)
                    for i in range(n)
                ]

        return f

    def src_moment_stage(s, g):
        # the src-width moment piece: bf(src), bf(gw*src) + elementwise
        with packed_mode(True):
            gw = tile_gate_packed(g, 32)
            ms = box_filter_packed(s, 4)
            cov = box_filter_packed(gw * s, 4) - ms * gw
            return ms, cov

    timeit("GF full primal (Pallas boxes)", gf_full, guide, src)
    timeit("GF full primal (einsum boxes)", gf_einsum, guide, src)
    timeit("guide moments (4-lane matmul path)", guide_moments, guide, src)
    timeit("src moment stage (2 box + mult)", src_moment_stage, src, guide)
    timeit("1x Pallas box src-width", box1, src, guide)
    timeit("2x Pallas box src-width", boxn_pallas(2), src, guide)
    timeit("6x Pallas box src-width", boxn_pallas(6), src, guide)
    timeit("2x einsum box src-width", boxn_einsum(2), src, guide)
    timeit("6x einsum box src-width", boxn_einsum(6), src, guide)


if __name__ == "__main__":
    main()
