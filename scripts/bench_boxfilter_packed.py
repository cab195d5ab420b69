"""Packed-layout box filter variants on the real chip.

The fusion branch spends most of its 232 ms (B16) in guided-filter box
sums. Candidates, all exact (clamped window 9, via zero-padded sums):
  A. band-einsum (current): phase-mixing banded matmuls
  B. separable dense packed conv: (5,1)/(1,5) packed kernels from the
     scattered ones-band (constant weights -> lax.conv)
  C. 2-D depthwise packed conv via conv_same_packed(ones(9,9,1,C), groups=C)
  D. separable depthwise packed conv: ones(9,1,1,C) then ones(1,9,1,C)
  E. unpack -> plain shift-add -> pack (reference point)
Run: python scripts/bench_boxfilter_packed.py
"""

import sys
import time

sys.path.insert(0, ".")

import os

import jax

if os.environ.get("PAIF_PLATFORM"):  # off-chip smoke: force a backend
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from paif_tpu.utils.jax_cache import configure_compile_cache


configure_compile_cache()

from paif_tpu.ops.guided_filter import box_filter  # noqa: E402
from paif_tpu.ops.packed import (  # noqa: E402
    box_filter_packed,
    conv_same_packed,
    pack,
    pack_kernel,
    unpack,
)

B, H, W, C = 16, 480, 640, 32
R = 4
K = 2 * R + 1


def timeit(name, fn, *args, iters=4, reps_lo=2, reps_hi=7):
    """Steady-state ms/call: slope of wall time vs chained in-jit reps —
    total/reps carries ~(fixed dispatch)/reps ms of bias, which is ~100%
    relative error on these ~3-10 ms kernels (CLAUDE.md, round-3 method)."""

    def make(reps):
        def body(*a):
            acc = jnp.float32(0)
            x = a[0]
            for _ in range(reps):
                out = fn(x, *a[1:])
                s = jnp.sum(out.astype(jnp.float32))
                acc = acc + s
                x = x + (s * 0).astype(x.dtype)
            return acc

        return jax.jit(body)

    lo, hi = make(reps_lo), make(reps_hi)
    try:
        float(lo(*args)), float(hi(*args))
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:120]}")
        return
    tlo = thi = None
    for _ in range(iters):
        t0 = time.perf_counter()
        float(lo(*args))
        tlo = min(tlo or 1e9, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(hi(*args))
        thi = min(thi or 1e9, time.perf_counter() - t0)
    print(f"{name:44s} {(thi - tlo) / (reps_hi - reps_lo) * 1e3:8.2f} ms", flush=True)


def variant_b(xp):
    """Separable dense packed conv from scattered 1-D ones bands."""
    c4 = xp.shape[-1]
    c = c4 // 4
    eye = np.eye(c, dtype=np.float32)
    wh = jnp.asarray(np.tile(eye[None, None], (K, 1, 1, 1)), xp.dtype)  # (9,1,C,C)
    ww = jnp.asarray(np.tile(eye[None, None], (1, K, 1, 1)), xp.dtype)  # (1,9,C,C)
    y = conv_same_packed(xp, wh)
    return conv_same_packed(y, ww)


def variant_c(xp):
    c = xp.shape[-1] // 4
    w = jnp.ones((K, K, 1, c), xp.dtype)
    return conv_same_packed(xp, w, groups=c)


def variant_d(xp):
    c = xp.shape[-1] // 4
    wh = jnp.ones((K, 1, 1, c), xp.dtype)
    ww = jnp.ones((1, K, 1, c), xp.dtype)
    return conv_same_packed(conv_same_packed(xp, wh, groups=c), ww, groups=c)


def _shift_sum(x, axis):
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (R, R)
    xp_ = jnp.pad(x, pad)
    idx = [slice(None)] * x.ndim
    acc = None
    for t in range(K):
        idx[axis] = slice(t, t + n)
        s = xp_[tuple(idx)]
        acc = s if acc is None else acc + s
    return acc


def variant_e(xp):
    x = unpack(xp)
    return pack(_shift_sum(_shift_sum(x, 1), 2))


def _box_axis_inlayout(x6, axis, phase_axis):
    """1-D original-H box sum (r=4) on the packed 6-D view, via 5 block
    shifts + phase combination. T[d,P,p]: d in {-1,0,1} is all-ones (both
    input phases feed both output phases); d=-2 misses (P1,p0); d=+2
    misses (P0,p1)."""
    pad = [(0, 0)] * x6.ndim
    pad[axis] = (2, 2)
    xp_ = jnp.pad(x6, pad)
    n = x6.shape[axis]

    def shift(d):
        idx = [slice(None)] * x6.ndim
        idx[axis] = slice(d + 2, d + 2 + n)
        return xp_[tuple(idx)]

    def ph(v, p):
        idx = [slice(None)] * x6.ndim
        idx[phase_axis] = p
        return v[tuple(idx)]

    mid = shift(-1) + shift(0) + shift(1)
    lo, hi = shift(-2), shift(2)
    both_mid = ph(mid, 0) + ph(mid, 1)
    out0 = both_mid + ph(lo, 0) + ph(lo, 1) + ph(hi, 0)
    out1 = both_mid + ph(lo, 1) + ph(hi, 0) + ph(hi, 1)
    return jnp.stack([out0, out1], axis=phase_axis)


def variant_f(xp):
    """Shift-add in the packed layout with explicit phase combination."""
    b, hp, wp_, c4 = xp.shape
    x6 = xp.reshape(b, hp, wp_, c4 // 4, 2, 2)
    x6 = _box_axis_inlayout(x6, 1, 4)
    x6 = _box_axis_inlayout(x6, 2, 5)
    return x6.reshape(b, hp, wp_, c4)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.bfloat16)
    xp = pack(x)
    print(f"devices: {jax.devices()}  shape={x.shape} packed={xp.shape}", flush=True)

    # correctness vs plain first (tiny shapes, f32; C=32 so the packed
    # width is 128 and the Pallas path applies)
    xs = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 32)), jnp.float32)
    ref = box_filter(xs, R)
    for name, fn in [
        ("B", variant_b),
        ("C", variant_c),
        ("D", variant_d),
        ("E", variant_e),
        ("F", variant_f),
    ]:
        got = unpack(fn(pack(xs)))
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"correctness {name}: max err {err:.2e}")

    from paif_tpu.ops.pallas.box_filter import box_filter_packed_pallas

    gp = unpack(box_filter_packed_pallas(pack(xs)))
    print(f"correctness P (pallas): max err {float(jnp.max(jnp.abs(gp - ref))):.2e}")
    gg = jax.grad(lambda t: jnp.sum(box_filter_packed_pallas(t) ** 2))(pack(xs))
    ge = jax.grad(lambda t: jnp.sum(box_filter(unpack(t), R) ** 2))(pack(xs))
    print(f"grad P vs plain: max err {float(jnp.max(jnp.abs(gg - ge))):.2e}")

    timeit("P pallas packed box", box_filter_packed_pallas, xp)

    # round-3 fused kernels: 2/4 tensors per launch, and the stage-A
    # product pair (box(x), box(x*g)) vs two boxes + XLA product
    import os

    from paif_tpu.ops.pallas.box_filter import (
        box_multi_packed_pallas,
        box_pair_prod_packed_pallas,
    )

    os.environ["PAIF_FUSED_GF_BOX"] = "1"
    gate = pack((jnp.max(x, -1, keepdims=True) - jnp.min(x, -1, keepdims=True)).astype(x.dtype))
    gate_w = jnp.tile(gate, (1, 1, 1, C))
    # NB: extra tensors ride as explicit args — closing over a 157 MB array
    # embeds it as an HLO constant (30-min remote compiles, see CLAUDE.md)
    timeit("M2 fused pair (2 boxes/launch)", lambda t: box_multi_packed_pallas((t, t + 1), R)[0], xp)
    os.environ["PAIF_FUSED_GF_K"] = "4"
    timeit("M4 fused quad (4 boxes/launch)", lambda t: box_multi_packed_pallas((t, t + 1, t + 2, t + 3), R)[0], xp)
    os.environ["PAIF_FUSED_GF_K"] = "2"
    timeit("PP prod pair box(x),box(x*g) fused", lambda t, g: box_pair_prod_packed_pallas(t, g, R)[0], xp, gate_w)
    timeit(
        "PP unfused: 2x pallas box + XLA prod",
        lambda t, g: box_filter_packed_pallas(t) + box_filter_packed_pallas(t * g),
        xp,
        gate_w,
    )

    timeit("A band-einsum packed (current)", lambda t: box_filter_packed(t, R), xp)
    timeit("F in-layout shift-add + phase mix", variant_f, xp)
    timeit("B separable dense packed conv", variant_b, xp)
    timeit("C depthwise 2D packed conv", variant_c, xp)
    timeit("D depthwise separable packed conv", variant_d, xp)
    timeit("E unpack/shift-add/pack", variant_e, xp)
    timeit("plain band matmul (unpacked, padded)", lambda t: box_filter(t, R), x)


if __name__ == "__main__":
    main()
