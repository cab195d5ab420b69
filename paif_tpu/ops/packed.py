"""Space-to-depth "packed" layout for small-channel convs on TPU.

Why: fusion-branch tensors are (B,480,640,32) NHWC. The TPU vector layout
tiles the minor (channel) dim to 128 lanes, so C=32 wastes 75% of every
vector register, every HBM transfer, AND the MXU: a C=32 conv runs at the
wall time of a C=128 one (round-1 finding, confirmed by the padded-buffer
dumps: 150 MB tensors occupy 600 MB). Effective MXU utilization ~6%.

Fix: operate on a 2x2 space-to-depth packing, (B,H,W,C) -> (B,H/2,W/2,4C).
With C=32 the packed channel dim is exactly 128 — zero lane padding. A
stride-1 SAME conv on the original tensor becomes a stride-1 SAME conv on
the packed tensor with a *scattered* kernel:

    y[2i+qi, 2j+qj, o] = sum_{dy,dx,c} w[dy,dx,c,o] x[2i+qi+dy, 2j+qj+dx, c]

Writing 2i+qi+dy = 2(i+dy') + pi (dy' = floor((qi+dy)/2), pi = (qi+dy)%2)
turns the tap sum into a conv over packed blocks with kernel

    wp[dy',dx', (c,pi,pj), (o,qi,qj)] = w[dy,dx,c,o]   (0 where |dy|>r)

whose packed spatial extent is ceil over phases: k=3 -> 3x3, k=5 -> 3x3,
k=7 -> 5x5. The structural zeros cost extra MXU FLOPs (x4 for k=3, x1.44
for k=5, x2 for k=7) but utilization rises 16x, a 4-11x net win, and every
elementwise op in between moves 4x less HBM.

Channel order is c-major, phase-minor: packed channel = c*4 + (pi*2 + pj).
This makes the layout compose:
  * concat along channels of packed tensors == pack of the concat;
  * channel reductions (max/mean/residue) are a reshape (...,C,4) + reduce;
  * per-phase broadcasts tile contiguously;
  * depthwise convs keep contiguous groups (group c = channels [4c, 4c+4)).

All code here is layout plumbing over lax.conv / einsum — XLA still does
the heavy lifting. Reference parity is exact up to f32 summation order
(the scattered-kernel conv computes the same sums as the NHWC conv).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paif_tpu.nn.layers import get_precision

# Trace-time layout flag. Set by FusionNetSearched around its body; layers
# consult it to decide packed vs plain execution. Safe under jit: the flag
# only exists while Python traces the forward, and each (model, flag) combo
# is its own trace.
_PACKED_MODE = False


def is_packed() -> bool:
    return _PACKED_MODE


@contextmanager
def packed_mode(on: bool = True):
    global _PACKED_MODE
    prev = _PACKED_MODE
    _PACKED_MODE = on
    try:
        yield
    finally:
        _PACKED_MODE = prev


def packed_enabled() -> bool:
    """Env gate (PAIF_PACKED, default on). Disable to A/B the plain layout."""
    return os.environ.get("PAIF_PACKED", "1") not in ("0", "false", "off")


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/2,W/2,4C), channel = c*4 + pi*2 + pj."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B,H',W',C,pi,pj)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H',W',4C) -> (B,2H',2W',C)."""
    b, hp, wp, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hp, wp, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B,H',pi,W',pj,C)
    return x.reshape(b, 2 * hp, 2 * wp, c)


@lru_cache(maxsize=64)
def _scatter_tensor(k: int, dilation: int) -> Tuple[np.ndarray, int]:
    """S[(t', pq, qq), t] selection for one spatial axis pair, plus packed
    half-width r'.

    For a 1-D window of taps d in {-r..r}*dilation (r = (k-1)//2 effective
    taps), S1[t', p, q, t] = 1 iff tap t lands at packed offset t'-r' with
    source phase p when the output phase is q. The 2-D tensor is the outer
    product over (H, W) axes; we keep the 1-D builder and combine in
    pack_kernel.
    """
    offs = [dilation * (t - (k - 1) // 2) for t in range(k)]
    lo = min((q + d) >> 1 for d in offs for q in (0, 1))
    hi = max((q + d) >> 1 for d in offs for q in (0, 1))
    rp = max(-lo, hi)
    kp = 2 * rp + 1
    s = np.zeros((kp, 2, 2, k), np.float32)
    for t, d in enumerate(offs):
        for q in (0, 1):
            v = q + d
            s[(v >> 1) + rp, v & 1, q, t] = 1.0
    return s, rp


def pack_kernel(w: jnp.ndarray, dilation: int = 1) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """HWIO (kh,kw,ci,co) -> packed HWIO (kh',kw',4ci,4co) + per-axis pads.

    Channel order matches pack(): input (c,pi,pj) -> c*4+pi*2+pj, output
    (o,qi,qj) -> o*4+qi*2+qj.
    """
    kh, kw, ci, co = w.shape
    sh, rh = _scatter_tensor(kh, dilation)
    sw, rw = _scatter_tensor(kw, dilation)
    sh = jnp.asarray(sh, w.dtype)
    sw = jnp.asarray(sw, w.dtype)
    # wp[a, b, pi, pj, qi, qj, c, o] = sum_{t,u} sh[a,pi,qi,t] sw[b,pj,qj,u] w[t,u,c,o]
    # Explicit precision: TPU's DEFAULT einsum is single-pass bf16 even for
    # f32 operands, which silently rounds the WEIGHTS on the f32 parity path
    # (found round 4: the winograd A/B's 1.6e-2 "parity failure" was this
    # rounding in the REFERENCE side, not the winograd transforms).
    wp = jnp.einsum("apqt,bPQu,tuco->abpPqQco", sh, sw, w, precision=get_precision())
    kp_h, kp_w = 2 * rh + 1, 2 * rw + 1
    # -> (a, b, c, pi, pj, o, qi, qj) -> (k',k',4ci,4co)
    wp = wp.transpose(0, 1, 6, 2, 3, 7, 4, 5).reshape(kp_h, kp_w, 4 * ci, 4 * co)
    return wp, (rh, rw)


def conv_same_packed(
    xp: jnp.ndarray, w: jnp.ndarray, dilation: int = 1, groups: int = 1
) -> jnp.ndarray:
    """Stride-1 SAME conv on a packed tensor from the ORIGINAL HWIO kernel.

    xp: (B,H',W',4ci); w: (kh,kw,ci/groups,co) as stored unpacked. groups>1
    follows lax grouped-conv semantics on the original channels (c-major
    packed channels keep each group contiguous).

    The Pallas implicit-GEMM z kernel (ops/pallas/zconv.py, opt-in via
    PAIF_PALLAS_ZCONV=1) wins isolated at k7/L>=384 shapes but loses ~9%
    end to end (fusion/layout barrier — see zconv_enabled); the scattered
    conv is the default everywhere. The pure-XLA z form below is likewise
    a measured negative (repack materialization: 11.0 vs 5.6 ms).

    groups>1 (depthwise) routes through a block-diagonal DENSE kernel by
    default (PAIF_PACKED_DW_DENSE): `feature_group_count>1` makes XLA:TPU
    pick a batch-minor 5-D layout for the operand — bf16[B,H',W',C,4]
    tiled T(4,128) pads the B=16 dim to 128 lanes (8x, 2.34 GB per temp;
    this is what OOMed the round-4 fused-box PGD step by 49 MB, and why
    the grouped microbench row measured 21.3 ms vs ~3 ms dense at
    (16,240,320,128)). The structural-zero MXU FLOPs of the dense form
    are the same class of trade as the scattered kernel itself.
    """
    from paif_tpu.ops.pallas.zconv import zconv, zconv_applicable

    if zconv_applicable(xp.shape, w.shape, dilation, groups, xp.dtype):
        return zconv(xp, w)
    if groups > 1 and os.environ.get("PAIF_PACKED_DW_DENSE", "1") not in ("0", "false", "off"):
        w = _block_diag_kernel(w, groups)
        groups = 1
    wp, (rh, rw) = pack_kernel(w, dilation)
    return jax.lax.conv_general_dilated(
        xp,
        wp,
        (1, 1),
        [(rh, rh), (rw, rw)],
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=get_precision(),
    )


def _block_diag_kernel(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Grouped HWIO kernel (kh,kw,ci/groups,co) -> dense block-diagonal
    (kh,kw,ci,co) computing the identical grouped conv with groups=1.

    lax grouped-conv semantics: input group g = original channels
    [g*cig, (g+1)*cig), output group g = [g*cog, (g+1)*cog)."""
    kh, kw, cig, co = w.shape
    cog = co // groups
    w5 = w.reshape(kh, kw, cig, groups, cog)
    eye = jnp.eye(groups, dtype=w.dtype)
    dense = jnp.einsum("abigo,gh->abgiho", w5, eye, precision=get_precision())
    return dense.reshape(kh, kw, cig * groups, co)


def _phase_lane_masks(c4: int) -> Tuple[np.ndarray, np.ndarray]:
    """Boolean lane masks (pi bit clear, pj bit clear) for c-major packing."""
    lanes = np.arange(c4)
    return ((lanes >> 1) & 1) == 0, (lanes & 1) == 0


def make_z(xp: jnp.ndarray) -> jnp.ndarray:
    """Half-shifted repack WITHOUT the lane permutation ("y" form):
    y[i,j,(c,pi,pj)] = x_orig[2i-2+pi, 2j-2+pj? ...] — precisely, a lane
    keeps its own phase bits and reads the block shifted DOWN one for
    pi=1 lanes: y[A] = xp[A-1] (pi=1) / xp[A] (pi=0) per axis, so that
    y[A, (c,pi,pj)] holds true-z[A, (c,1-pi,1-pj)]. The phase complement
    is folded into the conv weights (ops/pallas/zconv._z_weights), which
    turns the construction into pure pad/slice/select on UNPERMUTED lanes
    — one fused XLA pass (the lane-reverse variant measured 7.3 ms at
    (16,240,320,128); this form ~0.5 ms).

    Output has one extra block row/col (B,H'+1,W'+1,4C): block H' carries
    original row 2H'-1 = H-1 at its pi=1 lane. Out-of-range pixels are
    zero — the SAME-padding semantics of the original conv.
    """
    b, hp, wp_, c4 = xp.shape
    pi0, pj0 = _phase_lane_masks(c4)
    xq = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))  # xq[t] = xp[t-1]
    # y row A: pi=1 lanes read xp[A-1] = xq[A]; pi=0 read xp[A] = xq[A+1]
    yr = jnp.where(jnp.asarray(pi0), xq[:, 1 : hp + 2], xq[:, : hp + 1])
    return jnp.where(jnp.asarray(pj0), yr[:, :, 1 : wp_ + 2], yr[:, :, : wp_ + 1])


def conv_same_packed_z(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME conv on a packed tensor via the half-shift z form.

    Key identity: the original k-tap window around output row 2i+qi spans
    original rows that tile exactly into blocks of the HALF-SHIFTED packing
    z (rows 2A-1, 2A per z block A). A k3 conv therefore becomes a 2x2
    conv over z (contraction 4*C_packed = 512 for C=32, vs the scattered
    kernel's 9*128 = 1152 for the same 9*32 useful taps), and k7 a 4x4
    conv (16 blocks vs 25). Output lands directly in the standard packing.

    Uses the unpermuted "y" form of z (make_z) with the phase complement
    folded into the weights — see ops/pallas/zconv._z_weights.
    """
    from paif_tpu.ops.pallas.zconv import _Z_EXTENT, _z_weights

    z = make_z(xp)
    wz = _z_weights(w)
    a_lo, a_hi = _Z_EXTENT[w.shape[0]]
    # output block i reads z blocks i + a_lo .. i + a_hi; z has hp+1 rows
    pad = (-a_lo, a_hi - 1)
    return jax.lax.conv_general_dilated(
        z,
        wz,
        (1, 1),
        [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=get_precision(),
    )


def channel_reduce_packed(xp: jnp.ndarray, fn) -> jnp.ndarray:
    """Reduce over ORIGINAL channels of a packed tensor -> (B,H',W',4)."""
    b, hp, wp, c4 = xp.shape
    return fn(xp.reshape(b, hp, wp, c4 // 4, 4), -2)


def tile_gate_packed(gate: jnp.ndarray, c: int) -> jnp.ndarray:
    """Broadcast a packed 1-channel gate (B,H',W',4) across C channels."""
    return jnp.tile(gate, (1, 1, 1, c))


def box_filter_packed(xp: jnp.ndarray, r: int, allow_pallas: bool = True) -> jnp.ndarray:
    """Clamped box SUM of the ORIGINAL (2H',2W') image on a packed tensor.

    TPU r=4 full-width tensors route to the Pallas VPU kernel
    (ops/pallas/box_filter.py — 6.5 ms/call vs >=8.6 ms for every exact XLA
    formulation at (16,240,320,128)); everything else uses phase-mixing
    banded matmuls on the MXU with 128 unpadded lanes. Callers that sit
    inside a larger differentiated graph pass allow_pallas=False: the
    Pallas custom call is a fusion barrier, and the einsum form wins there
    (guided filter backward: 5.36 vs 5.0 attacked pairs/s end to end).
    """
    from paif_tpu.ops.pallas.box_filter import (
        box_filter_packed_pallas,
        pallas_box_applicable,
    )

    if xp.shape[-1] == 4 and os.environ.get("PAIF_GF_DENSE_GUIDE", "1") not in ("0", "off"):
        # guide-width (1 original channel): the 4-lane minor dim pads 32x.
        # Unpack to (B,H,W) with W minor (dense lanes) and run the plain
        # band matmuls there — exact (same per-axis banded sums).
        from paif_tpu.ops.guided_filter import _box_dense_c1

        return pack(_box_dense_c1(unpack(xp), r))

    if allow_pallas and pallas_box_applicable(xp.shape, r):
        return box_filter_packed_pallas(xp, r)

    from paif_tpu.ops.guided_filter import _band_matrix  # same band, full res

    b, hp, wp, c4 = xp.shape
    c = c4 // 4
    band_h = _band_matrix(2 * hp, r).reshape(hp, 2, hp, 2)  # [i,p,i',p']
    band_w = _band_matrix(2 * wp, r).reshape(wp, 2, wp, 2)
    bh = jnp.asarray(band_h, xp.dtype)
    bw = jnp.asarray(band_w, xp.dtype)
    x6 = xp.reshape(b, hp, wp, c, 2, 2)  # (B,i,j,c,pi,pj)
    x6 = jnp.einsum("ipIP,bIjcPq->bijcpq", bh, x6, precision=get_precision())
    x6 = jnp.einsum("jqJQ,biJcpQ->bijcpq", bw, x6, precision=get_precision())
    return x6.reshape(b, hp, wp, c4)
