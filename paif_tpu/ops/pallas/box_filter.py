"""Pallas TPU kernel: clamped box SUM (radius 4) on the packed 2x2 layout.

Why: the guided filter's box sums are the fusion branch's top cost. Every
exact XLA formulation measured on v5e at (16,240,320,128) bf16
(scripts/bench_boxfilter_packed.py):
    band-matmul einsum 10.3 ms | separable packed conv 8.6 ms |
    depthwise packed conv 27 ms | in-layout shift-add 16 ms |
    unpack/shift/pack 43 ms
All matmul forms burn >=14x dead MXU FLOPs (contraction >=128 for 9 useful
taps); all shift-add forms lower to unfused one-slice-per-pass loops. The
data itself is only 2x(157 MB read + 157 MB write) = ~0.8 ms of HBM traffic:
this kernel gets there by keeping each (H- or W-) pass inside VMEM.

Design:
  * Two separable passes. The H-pass grids over (batch, W-tiles) so the full
    H' extent sits in VMEM and row shifts are internal; the W-pass grids
    over (batch, H-tiles) likewise. No cross-program halo.
  * Packed phases: original H index = 2*i + pi with pi*2+pj the low bits of
    the lane (channel = c*4 + pi*2 + pj). The 9-tap window decomposes into
    block shifts d in [-2,2]: d in {-1,0,1} feed BOTH phases; d=-2 misses
    (P=1 <- p=0); d=+2 misses (P=0 <- p=1). Phase sums are masked XOR lane
    rolls (XOR 2 for pi in the H-pass, XOR 1 for pj in the W-pass) — pure
    VPU, zero MXU FLOPs.
  * f32 VMEM scratch with zeroed 2-row halos; shifted reads slice the
    scratch ref (f32 — bf16 sublane-offset slices miscompile, see
    small_conv.py notes).
  * VJP: the clamped box operator is symmetric (band matrix B = B^T, and
    (Bh ∘ Bw)^T = Bw ∘ Bh = same op), so the backward pass IS the kernel.

Even radii r = 2m generalize the r=4 structure (2m-1 both-phase central
block shifts + one single-phase edge tap per side): r=4 is the reference's
Cell_Decom radius (model_fusion_auto.py:500); r=2 serves the subsample-2
fast guided filter (ops/guided_filter.py). Other radii fall back to the
matmul path in ops/packed.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4  # window 9 on the original grid; block shifts -2..2 on the packed grid
SUPPORTED_R = (2, 4)  # even radii: m = r//2 block halo, same tap structure


def pallas_box_enabled() -> bool:
    """On by default on TPU; PAIF_PALLAS_BOX=0 reverts to the matmul path."""
    env = os.environ.get("PAIF_PALLAS_BOX")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _xor_roll(v: jnp.ndarray, xor_bit: int) -> jnp.ndarray:
    """v[..., l] -> v[..., l XOR xor_bit] along the minor (lane) axis.

    pltpu.roll is circular with non-negative shifts; the wrapped lanes are
    never selected (a lane with the low phase bit clear is never within
    xor_bit of the top, and vice versa), so two masked rolls compose the
    XOR permutation exactly.
    """
    n = v.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    low = (lane & xor_bit) == 0
    fwd = pltpu.roll(v, n - xor_bit, axis=v.ndim - 1)  # out[l] = v[l + xor_bit]
    bwd = pltpu.roll(v, xor_bit, axis=v.ndim - 1)  # out[l] = v[l - xor_bit]
    return jnp.where(low, fwd, bwd)


def _combine(mid, lo, hi, xor_bit):
    """Tap/phase combination shared by both passes (see module docstring).

    out = mid + lo + hi + xor(mid) + [low? xor(lo) : xor(hi)]. The masked
    tail folds into ONE xor: with u = where(low, hi, lo) at SOURCE lanes,
    xor(u)[l] = low(l) ? lo[l^b] : hi[l^b] (the phase mask complements
    under xor) — so a single where + one xor replaces two of each.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, mid.shape, mid.ndim - 1)
    low_phase = (lane & xor_bit) == 0
    u = mid + jnp.where(low_phase, hi, lo)
    return mid + lo + hi + _xor_roll(u, xor_bit)


def _pass_kernel(x_ref, o_ref, s_ref, *, axis: int, xor_bit: int, m: int):
    """One separable box pass over the full `axis` extent of the block.

    x_ref/o_ref: (1, A, B, C4) with the pass axis at position `axis` (1 or
    2); s_ref: f32 scratch with m (= r//2 block) halo rows on each side of
    that axis. Tap structure for even radius r = 2m: the 2m-1 central
    block shifts feed BOTH phases (mid), the extreme shifts -m/+m miss one
    phase each (lo/hi with the masked xor in _combine).
    """
    n = x_ref.shape[axis]

    def _idx(start, stop):
        idx = [slice(None)] * 3
        idx[axis - 1] = slice(start, stop)
        return tuple(idx)

    def sl(ref, start, stop):
        return ref[_idx(start, stop)]

    # zero halos, then the body
    z2 = list(s_ref.shape)
    z2[axis - 1] = m
    zeros = jnp.zeros(z2, jnp.float32)
    s_ref[_idx(0, m)] = zeros
    s_ref[_idx(n + m, n + 2 * m)] = zeros
    s_ref[_idx(m, n + m)] = x_ref[0].astype(jnp.float32)

    mid = sl(s_ref, 1, n + 1)
    for d in range(2, 2 * m):
        mid = mid + sl(s_ref, d, n + d)
    o_ref[0] = _combine(mid, sl(s_ref, 0, n), sl(s_ref, 2 * m, n + 2 * m), xor_bit).astype(
        o_ref.dtype
    )


def _pick_tile(total: int, bytes_per_col: int) -> int:
    """Largest 8-aligned divisor of `total` whose f32 column-slab fits VMEM.

    The budget is per VALUE, not per kernel: besides the scratch, Mosaic
    keeps ~6 live f32 temporaries of the same shape (mid/lo/hi + rolls +
    accumulator), so ~8x the budget of VMEM is actually in play. Two-stage:
    prefer the conservative 1 MB budget (~8 MB in play) and only relax to
    1.5 MB (~12 of the ~16 MB VMEM — validated on-chip at the flagship
    shapes) when nothing fits at 1 MB. (Round-3 regression fix: the
    8-align constraint plus a flat 1 MB budget silently disqualified the
    flagship W-pass — 240 rows need tile 8 at 1.33 MB — so the kernel fell
    back to einsum at exactly the shapes it was built for.)
    """
    for budget in (1024 * 1024, 1536 * 1024):
        for t in range(total, 0, -1):
            # the tile lands in a block's sublane slot: keep it 8-aligned
            if total % t == 0 and t % 8 == 0 and t * bytes_per_col <= budget:
                return t
    return 0  # nothing fits: caller must fall back to the matmul path


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _box_vjp(r: int, xp: jnp.ndarray) -> jnp.ndarray:
    return _box_fwd_impl(xp, r)


def box_filter_packed_pallas(xp: jnp.ndarray, r: int = R) -> jnp.ndarray:
    return _box_vjp(r, xp)


def _box_fwd_impl(xp: jnp.ndarray, r: int = R) -> jnp.ndarray:
    b, hp, wp, c4 = xp.shape
    m = r // 2
    # H-pass: full H' per block, tiles over W'. The W-tiles make each block
    # a strided DMA, but the kernel is VPU-bound, not DMA-bound (a 3x-read
    # contiguous-halo variant measured 7.99 vs 6.69 ms — see git history).
    tw = _pick_tile(wp, (hp + 2 * m) * c4 * 4)
    y = pl.pallas_call(
        functools.partial(_pass_kernel, axis=1, xor_bit=2, m=m),
        grid=(b, wp // tw),
        in_specs=[pl.BlockSpec((1, hp, tw, c4), lambda i, j: (i, 0, j, 0))],
        out_specs=pl.BlockSpec((1, hp, tw, c4), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM((hp + 2 * m, tw, c4), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xp)
    # W-pass: full W' per block (already contiguous), tiles over H'.
    th2 = _pick_tile(hp, (wp + 2 * m) * c4 * 4)
    return pl.pallas_call(
        functools.partial(_pass_kernel, axis=2, xor_bit=1, m=m),
        grid=(b, hp // th2),
        in_specs=[pl.BlockSpec((1, th2, wp, c4), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, th2, wp, c4), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM((th2, wp + 2 * m, c4), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(y)


def _box_fwd(r, xp):
    return _box_fwd_impl(xp, r), None


def _box_bwd(r, _res, g):
    # The operator is symmetric: B^T = B per axis, (Bh∘Bw)^T = Bw∘Bh = Bh∘Bw.
    return (_box_fwd_impl(g, r),)


_box_vjp.defvjp(_box_fwd, _box_bwd)


def pallas_box_applicable(xp_shape, r: int) -> bool:
    b, hp, wp, c4 = xp_shape
    return (
        r in SUPPORTED_R
        and c4 % 128 == 0
        and hp % 8 == 0
        and wp % 8 == 0
        and hp > 2 * r
        and wp > 2 * r
        # both passes must have a VMEM-feasible 8-aligned tile (very large
        # resolutions fall back to the matmul path instead of overflowing)
        and _pick_tile(wp, (hp + 2 * (r // 2)) * c4 * 4) > 0
        and _pick_tile(hp, (wp + 2 * (r // 2)) * c4 * 4) > 0
        and pallas_box_enabled()
    )
