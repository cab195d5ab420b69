"""Pallas TPU kernel: implicit-GEMM conv for the packed 2x2 layout (k3/k7).

The round-2 scattered-kernel conv (ops/packed.py pack_kernel) runs k3 at
XLA's own dense-conv ceiling but burns 4x structural-zero MXU FLOPs
(contraction 9*4C for 9*C useful taps). The fix measured here is the
"half-shift" identity: the k-tap window around output row 2i+qi tiles
exactly into blocks of the HALF-SHIFTED packing z (z block A holds original
rows 2A-1, 2A), so a k3 conv is a 2x2 conv over z (contraction 4*4C, 9/16
useful) and k7 a 4x4 conv (16 blocks vs the scattered 25, 49/64 useful).

Doing that via XLA loses the win to the z materialization (measured
7.3 ms for make_z + 3.7 ms conv vs 5.6 ms scattered at (16,240,320,128)):
the lane-complement + shifted selects lower to slow standalone passes.
This kernel fuses them: each program DMAs an input tile (+halo) into VMEM
(double-buffered across the linearized grid), builds the z tile with
phase-selects (row shifts are free leading-dim slices; col shifts are f32
sublane ROLLS — bf16 sublane-offset slices miscompile and bf16 rotates are
unimplemented, see docs/MOSAIC.md and the v1-v4 history in git), and
contracts the ka*ka taps as MXU matmuls with f32 accumulation.

Measured end state: the z construction costs ~5 VPU passes no matter the
contraction, so isolated the kernel only wins where the MXU saving is
large — k7, and k3 at L>=384 (zconv_applicable limits dispatch to those) —
and END TO END even those wins invert (56.4 vs 61.7 pairs/s at B32): the
custom calls are fusion/layout barriers inside the full graph. Default
OFF (zconv_enabled); kept as a measured negative result with tests.

Semantics: exactly conv_same_packed's scattered conv (stride-1 SAME on the
original grid, reference padding table operations_m.py:119-132) for odd k,
dilation 1, groups 1; bf16 in, f32 accumulate — the TPU fast path. The f32
parity path keeps the XLA scattered conv.

Reference op semantics: core/model_fusion_auto.py:439-445 cell ops via
operations_m.py:114-145 (BasicConv padding).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# z-window extents per original kernel size: A in [a_lo, a_hi] s.t.
# dy = 2A - 1 + pi - qi covers [-r, r] (r = (k-1)//2)
_Z_EXTENT = {3: (0, 1), 7: (-1, 2)}

_VMEM_BUDGET = 11 * 1024 * 1024


def zconv_enabled() -> bool:
    """Opt-in (PAIF_PALLAS_ZCONV=1). Isolated the kernel beats the
    scattered conv at its dispatched shapes (k7: 8.7 vs 9.5 ms, k3 L=384:
    11.6 vs 12.6), but END TO END it loses ~9% forward (56.4 vs 61.7
    pairs/s at B32) — the custom calls are fusion/layout barriers inside
    the full graph, the same failure mode as the round-2 SR-attention and
    small-conv kernels. Kept as measured research; default off."""
    env = os.environ.get("PAIF_PALLAS_ZCONV")
    if env is not None:
        return env not in ("0", "false", "off")
    return False


def _divisors(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


@functools.lru_cache(maxsize=128)
def _pick_tiles(hp: int, wp: int, L: int, co4: int, ka: int):
    """Largest-M (th, tw) with tw%8==0 fitting the VMEM budget, or None."""
    best = None
    for th in _divisors(hp):
        for tw in _divisors(wp):
            if tw % 8:
                continue
            halo = (th + ka) * (tw + 8)  # DMA cols are 8-aligned (tw+8)
            nb = ka + 1
            mem = (
                2 * halo * L * 2  # xt double buffer (bf16)
                + nb * halo * L * 4  # u_B rolled values (f32 for the rolls)
                + halo * L * 2  # zc transient
                + th * tw * co4 * 4  # f32 accumulator
                + ka * ka * L * co4 * 2  # weights
                + th * tw * co4 * 2  # out block
            )
            if mem > _VMEM_BUDGET:
                continue
            m = th * tw
            # prefer moderate tiles: M in [512, 8192] amortizes per-program
            # overhead without starving double-use of VMEM
            score = (min(m, 8192), m)
            if best is None or score > best[0]:
                best = (score, (th, tw))
    return best[1] if best else None


def zconv_applicable(xp_shape, w_shape, dilation: int, groups: int, dtype) -> bool:
    """True where the kernel MEASURES faster than the scattered XLA conv.

    v5e @ (16,240,320,·) bf16, scattered vs this kernel (ms):
      k3 L=128: 5.7 vs 6.4   k3 L=256: 8.8 vs 8.8   k3 L=384: 12.6 vs 11.6
      k7 L=128: 9.5 vs 8.7
    The z-tile construction costs ~5 VPU passes (~1 ms/pass at this chip's
    issue rate) regardless of contraction size; the MXU saving (2.25x for
    k3, 1.56x for k7) only outweighs it once the matmul side is large
    enough — k7 always, k3 from L>=384 (or a wide output, the dx case).
    Below that the scattered conv's dead FLOPs are cheaper than the data
    rearrangement, so dispatch keeps XLA."""
    kh, kw, _, co = w_shape
    if not (zconv_enabled() and dilation == 1 and groups == 1 and kh == kw and kh in _Z_EXTENT):
        return False
    if dtype != jnp.bfloat16:
        return False
    b, hp, wp, L = xp_shape
    co4 = 4 * co
    if L % 128 or co4 % 128:
        return False
    if kh == 3 and L < 384 and co4 < 384:
        return False  # measured slower than scattered below this size
    a_lo, a_hi = _Z_EXTENT[kh]
    ka = a_hi - a_lo + 1
    if hp <= ka or wp <= ka:
        return False
    return _pick_tiles(hp, wp, L, co4, ka) is not None


@functools.lru_cache(maxsize=32)
def _z_scatter(k: int) -> np.ndarray:
    """S[A_idx, pi, qi, t]: tap t (offset d = t - r) of output phase qi
    reads z block A = a_lo + A_idx at source phase pi iff 2A-1+pi-qi == d."""
    r = (k - 1) // 2
    a_lo, a_hi = _Z_EXTENT[k]
    s = np.zeros((a_hi - a_lo + 1, 2, 2, k), np.float32)
    for a in range(a_lo, a_hi + 1):
        for pi in (0, 1):
            for qi in (0, 1):
                d = 2 * a - 1 + pi - qi
                if -r <= d <= r:
                    s[a - a_lo, pi, qi, d + r] = 1.0
    return s


def _z_weights(w: jnp.ndarray) -> jnp.ndarray:
    """HWIO (k,k,ci,co) -> (ka,ka,4ci,4co) z-tap weights with the lane
    PHASE COMPLEMENT folded in: the kernel builds its z tile without the
    lane permutation (a lane keeps its own (pi,pj) bits and only the
    spatial shift is phase-selected), so input row (c,pi,pj) here carries
    the weight of z's (c,1-pi,1-pj)."""
    kh, kw, ci, co = w.shape
    s = jnp.asarray(_z_scatter(kh), w.dtype)
    from paif_tpu.nn.layers import get_precision

    wz = jnp.einsum("apqt,bPQu,tuco->abpPqQco", s, s, w, precision=get_precision())
    # fold the complement: flip the (pi, pj) axes of the INPUT phase dims
    wz = wz[:, :, ::-1, ::-1]
    ka = s.shape[0]
    # (a,b,pi,pj,qi,qj,c,o) -> (a,b,c,pi,pj,o,qi,qj) -> (ka,ka,4ci,4co)
    wz = wz.transpose(0, 1, 6, 2, 3, 7, 4, 5).reshape(ka, ka, 4 * ci, 4 * co)
    return wz


def _zconv_kernel(x_hbm, w_ref, o_ref, xt, sem, *, th, tw, ka, L, co4, out_dtype, nh, nw):
    # Linearized grid with a 2-slot double buffer: program p starts the DMAs
    # for tile p+1, then waits on its own (started by p-1, or by itself at
    # p==0) — the input fetch overlaps the previous tile's compute.
    #
    # All selects stay in bf16 with ROW (leading-dim) slices only; the
    # column shifts run as SUBLANE rolls (pltpu.roll) whose wrap-around
    # contamination lands in the unused 8-col margin — sublane-OFFSET
    # slices (which miscompile in bf16 and relayout at ~1 pass each in
    # f32, the v1/v2 kernels' dominant cost) never occur. HBM DMA offsets
    # and shapes must be 8-aligned on the sublane dim, so the tile is
    # fetched once at an aligned offset with a tw+8-col extent.
    p = pl.program_id(0)
    n = pl.num_programs(0)
    rows, cols = th + ka, tw + 8
    nb = ka + 1

    def dma_for(q, slot):
        b = q // (nh * nw)
        r = q % (nh * nw)
        i = r // nw
        j = r % nw
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * th, rows), pl.ds(j * tw, cols), :],
            xt.at[slot],
            sem.at[slot],
        )

    @pl.when(p == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(p + 1 < n)
    def _():
        dma_for(p + 1, (p + 1) % 2).start()

    dma_for(p, p % 2).wait()
    slot = p % 2
    # phase-selected shifts WITHOUT the lane permutation (folded into the
    # weights): row a of u_B = x[a] for pi=1 lanes, x[a+1] for pi=0 lanes.
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows - 1, cols, L), 2)
    pi1 = ((lane >> 1) & 1) == 1
    pj1 = (lane & 1) == 1
    xb = xt[slot]
    # f32 here is for the ROLLS (Mosaic: "Rotate with non-32-bit data" is
    # unimplemented), not numerics — the dot inputs are cast back to bf16
    u0 = jnp.where(pi1, xb[: rows - 1], xb[1:rows]).astype(jnp.float32)
    us = [u0]
    for _ in range(1, nb):
        # out[s] = prev[s+1]: a circular sublane roll; wrapped cols land in
        # the >= tw margin, which the tap slices below never read
        us.append(pltpu.roll(us[-1], cols - 1, axis=1))
    acc = jnp.zeros((th, tw, co4), jnp.float32)
    dn = (((2,), (0,)), ((), ()))
    for B_ in range(ka):
        zc = jnp.where(pj1, us[B_], us[B_ + 1]).astype(jnp.bfloat16)
        for A_ in range(ka):
            acc = acc + jax.lax.dot_general(
                zc[A_ : A_ + th, :tw], w_ref[A_, B_], dn, preferred_element_type=jnp.float32
            )
    o_ref[0] = acc.astype(out_dtype)


def _zconv_impl(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    b, hp, wp, L = xp.shape
    k = w.shape[0]
    co4 = 4 * w.shape[3]
    a_lo, a_hi = _Z_EXTENT[k]
    ka = a_hi - a_lo + 1
    th, tw = _pick_tiles(hp, wp, L, co4, ka)
    plo = 1 - a_lo
    # W right-pad so every tile's (tw+8)-col DMA at col offset up to +ka
    # stays in bounds
    xpad = jnp.pad(xp, ((0, 0), (plo, a_hi), (plo, 8 - plo), (0, 0)))
    wz = _z_weights(w)
    nh, nw = hp // th, wp // tw
    kern = functools.partial(
        _zconv_kernel, th=th, tw=tw, ka=ka, L=L, co4=co4, out_dtype=xp.dtype, nh=nh, nw=nw
    )
    return pl.pallas_call(
        kern,
        grid=(b * nh * nw,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, co4),
            lambda p: (p // (nh * nw), (p % (nh * nw)) // nw, p % nw, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, co4), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + ka, tw + 8, L), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xpad, wz)


@jax.custom_vjp
def zconv(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME packed conv (k3/k7, d1) via the Pallas z kernel."""
    return _zconv_impl(xp, w)


def _zconv_fwd(xp, w):
    return _zconv_impl(xp, w), (xp, w)


def _zconv_bwd(res, g):
    xp, w = res
    # dx: correlation with the spatially-flipped, io-transposed kernel —
    # itself a SAME packed conv, routed back through the dispatcher (Pallas
    # when the transposed shape qualifies).
    from paif_tpu.ops.packed import conv_same_packed

    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv_same_packed(g, wt)
    # dw: conv backprop-filter via XLA on the scattered form (DCE'd inside
    # PGD graphs, which never ask for weight gradients).
    from paif_tpu.ops.packed import pack_kernel
    from paif_tpu.nn.layers import get_precision

    def scattered(wv):
        wpk, (rh, rw) = pack_kernel(wv, 1)
        return jax.lax.conv_general_dilated(
            xp,
            wpk,
            (1, 1),
            [(rh, rh), (rw, rw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=get_precision(),
        )

    _, vjp = jax.vjp(scattered, w)
    (dw,) = vjp(g)
    return dx, dw


zconv.defvjp(_zconv_fwd, _zconv_bwd)
