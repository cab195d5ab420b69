"""Winograd F(2x2, 3x3) vs the scattered packed k3 conv — the measured data
point VERDICT r3 item 5 asks for (the round-2/3 rejection was analytical).

Shape: (16,240,320,128) packed == original (16,480,640,32) k3 32->32, the
fusion branch's hot conv (reference op source: operations_m.py:114-145).

Design (packed-native, no unpack round-trip):
  * Input transform V = (Bt d Bt^T) computed per axis directly in packed
    space: tile index == packed block index; the 4 tile rows u=0..3 are
    (block-1, phase1), (block, phase0), (block, phase1), (block+1, phase0),
    so V's 4 entries per axis are lane-selects of 3 shifted copies combined
    with Bt — one einsum per axis on the VPU.
  * The 16 per-entry matmuls contract the ORIGINAL C=32 channels:
    einsum('xijabc,abck->xijabk') — a 16-batch (M, 32) @ (32, 32) matmul.
    This is the structural question the measurement answers: Winograd cuts
    MXU FLOPs 2.25x (16 taps vs 36 effective) but its contraction dim is
    the unpacked C=32, which re-pads to 128 MXU lanes — exactly the padding
    the packed layout exists to avoid. The scattered conv burns 4x
    structural-zero FLOPs at full 128-lane utilization instead.
  * Output transform At M At^T lands natively in the packed layout
    (tile-entry bits (m,n) ARE the phase bits).

Run: python scripts/bench_winograd.py        (real chip)
     PAIF_PLATFORM=cpu python scripts/bench_winograd.py --smoke
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

from paif_tpu.nn.layers import get_precision
from paif_tpu.ops.packed import conv_same_packed, pack, unpack

# F(2,3) transform matrices (Lavin & Gray 2016 via the Toom-Cook points
# {0, 1, -1, inf}); exact in f32 (entries are 0, +-1, +-0.5).
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

# tile row u -> (block shift s in {-1,0,1} indexed 0..2, phase p): the SAME-pad
# 3x3 window around output rows (2i, 2i+1) spans original rows 2i-1 .. 2i+2.
_USP = [(0, 1), (1, 0), (1, 1), (2, 0)]


def _axis_combine() -> np.ndarray:
    """C[a, s, p] with V_a = sum_u BT[a,u] d_u, d_u = shifted(s_u)[phase p_u]."""
    c = np.zeros((4, 3, 2), np.float32)
    for u, (s, p) in enumerate(_USP):
        c[:, s, p] += BT[:, u]
    return c


def winograd_packed(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """k3 SAME conv on a packed tensor via Winograd F(2x2,3x3).

    xp: (B,H',W',4C) c-major/phase-minor; w: (3,3,C,K) HWIO. Returns packed
    (B,H',W',4K). Transforms run in the compute dtype; exact transform
    entries keep parity within summation-order noise.
    """
    b, hp, wp_, c4 = xp.shape
    c = c4 // 4
    comb = jnp.asarray(_axis_combine(), xp.dtype)
    x6 = xp.reshape(b, hp, wp_, c, 2, 2)
    # shifted stacks along each packed axis: s=0 -> block-1, 1 -> block, 2 -> block+1
    zpad = jnp.zeros_like(x6[:, :1])
    xs_h = jnp.stack(
        [
            jnp.concatenate([zpad, x6[:, :-1]], 1),
            x6,
            jnp.concatenate([x6[:, 1:], zpad], 1),
        ]
    )  # (3,B,H',W',C,2,2)
    vh = jnp.einsum("hsp,sbijcpq->hbijcq", comb, xs_h, precision=get_precision())  # (4,B,H',W',C,2)
    zpad_w = jnp.zeros_like(vh[:, :, :, :1])
    xs_w = jnp.stack(
        [
            jnp.concatenate([zpad_w, vh[:, :, :, :-1]], 3),
            vh,
            jnp.concatenate([vh[:, :, :, 1:], zpad_w], 3),
        ]
    )  # (3,4,B,H',W',C,2)
    v = jnp.einsum("wsq,shbijcq->hwbijc", comb, xs_w, precision=get_precision())  # (4,4,B,H',W',C)

    g = jnp.asarray(G, w.dtype)
    u = jnp.einsum("hu,wv,uvck->hwck", g, g, w, precision=get_precision())  # (4,4,C,K)
    m = jnp.einsum(
        "hwbijc,hwck->hwbijk", v, u, precision=get_precision()
    )  # (4,4,B,H',W',K)

    at = jnp.asarray(AT, xp.dtype)
    y = jnp.einsum("mh,nw,hwbijk->bijkmn", at, at, m, precision=get_precision())  # (B,H',W',K,2,2)
    return y.reshape(b, hp, wp_, 4 * (w.shape[-1]))


def timeit(name, fn, *args, gflops=None, iters=5, reps=10):
    def body(*a):
        a = list(a)
        acc = jnp.float32(0)
        for _ in range(reps):
            out = fn(*a)
            s = jnp.sum(out.astype(jnp.float32))
            acc = acc + s
            a[0] = a[0] + (s * 0).astype(a[0].dtype)
        return acc

    red = jax.jit(body)
    float(red(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / reps * 1e3
    extra = f"  {gflops / ms:7.1f} GF/ms" if gflops else ""
    print(f"{name:46s} {ms:9.3f} ms{extra}", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, correctness only")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # correctness at a small shape, f32
    os.environ["PAIF_PRECISION"] = "highest"
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 20, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 8, 8)), jnp.float32)
    xp = pack(x)
    ref = unpack(jax.jit(conv_same_packed)(xp, w))
    got = unpack(jax.jit(winograd_packed)(xp, w))
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"winograd f32 max-abs err vs scattered conv: {err:.2e}")
    assert err < 1e-4, err
    os.environ["PAIF_PRECISION"] = "default"
    if args.smoke:
        return

    # flagship A/B: packed (16,240,320,128) bf16 == original (16,480,640,32)
    B, HP, WP, C = 16, 240, 320, 32
    dt = jnp.bfloat16
    xp = jnp.asarray(rng.normal(0, 1, (B, HP, WP, 4 * C)), dt)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)), dt)
    useful = 2 * 9 * C * C * B * (2 * HP) * (2 * WP) / 1e9  # GFLOP
    print(f"useful conv work: {useful:.1f} GFLOP")
    t_scat = timeit("scattered packed k3 (shipped)", conv_same_packed, xp, w, gflops=useful)
    t_wino = timeit("winograd F(2,3x3) packed", winograd_packed, xp, w, gflops=useful)
    print(
        f"verdict: winograd {'WINS' if t_wino < t_scat else 'LOSES'} "
        f"({t_wino:.2f} vs {t_scat:.2f} ms, {t_wino / t_scat:.2f}x)"
    )


if __name__ == "__main__":
    main()
