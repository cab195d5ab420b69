"""Pallas TPU kernel: stride-1 'same' conv2d specialized for SMALL channel
counts (the fusion branch runs C=32 everywhere).

Why: XLA's conv lowering at (8,480,640,32) costs the same wall time for
C=32 as for C=128 (measured 6.3 vs 7.5 ms on v5e) — the 128-lane MXU tiles
are mostly padding. This kernel restructures the conv as a tall matmul per
row-tile: the K*K taps are stacked along the contraction axis, giving a
contraction dim of K*C per ky slab (96..224 for k 3..7 at C=32) instead of
C — full MXU sublanes.

Measured v5e results at (8,480,640,32) bf16: 7x7 conv 33.6 ms vs XLA 50.8 ms
(1.5x win, used by the genotype's Residualblocks_7_1); 3x3 conv 14.0 ms vs
XLA 6.3 ms (VMEM lane padding forces tiny row tiles; XLA wins — the Conv
factory dispatches here only for k >= 5).

Mosaic lowering constraints shaped the design (each was hit and worked
around): value-level concat of differently-offset slices is unsupported
(tap stacking goes through a staging VMEM buffer via stores); manual HBM DMA
requires 128-aligned lane dims (so the halo'd row overlap is expressed as K
row-shifted *views* of the padded input, each tiled disjointly by standard
BlockSpecs — XLA materializes the shifted copies, costing K reads of the
input, still far cheaper than the un-stacked conv).

Supports dilation (the reference ops use d in {1,2}); fp32 accumulation;
custom VJP (dx via the same kernel with a spatially-flipped, transposed
kernel — exact for stride-1 same conv; dw via XLA, training-only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_conv_enabled() -> bool:
    """Opt-in (PAIF_PALLAS_CONV=1). Isolated 7x7 convs are 1.5x faster than
    XLA here, but in the FULL joint model the k shifted-view materializations
    and custom-VJP residuals regressed end-to-end time (368->439 ms/batch)
    and broke the PGD remat memory plan (HBM OOM) — so XLA is the default."""
    return os.environ.get("PAIF_PALLAS_CONV") in ("1", "true", "True")


def _lanes(c: int) -> int:
    """VMEM lane padding: the minormost dim rounds up to a multiple of 128."""
    return -(-c // 128) * 128


def _pick_tile_h(h: int, wp: int, c_in: int, c_out: int, k: int, itemsize: int) -> int:
    """Largest divisor of h whose VMEM footprint (k double-buffered input
    views + f32 staging + f32 accumulator + output) stays under ~10MB.
    Lane padding to 128 dominates at small C and must be modeled."""
    budget = 10 * 1024 * 1024
    for th in range(min(16, h), 0, -1):
        if h % th:
            continue
        views = 2 * k * th * wp * _lanes(c_in) * itemsize  # double-buffered
        stage = th * wp * _lanes(k * c_in) * 4
        acc = th * wp * _lanes(c_out) * 4
        out = 2 * th * wp * _lanes(c_out) * itemsize
        if views + stage + acc + out <= budget:
            return th
    return 1


def _conv_kernel(*refs, k: int, d: int, th: int, w_out: int, c_in: int):
    """One (batch, row-tile) program.

    refs = (x_0..x_{k-1}, w, o, stage, acc): x_ky is the ky-row-shifted view
    tile (1, TH, Wp, C); w is (k, k*C, C_out) tap-stacked weights; stage is
    (TH, W, k*C) VMEM staging; acc is (TH*W, C_out) f32.
    """
    xs = refs[:k]
    w_ref, o_ref, stage_ref, acc_ref = refs[k], refs[k + 1], refs[k + 2], refs[k + 3]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for ky in range(k):
        # Slice/stage in f32: under bf16's (16,128) sublane packing, W-offset
        # slices are silently miscompiled by Mosaic; f32 (8,128) tiles lower
        # them exactly. Cast back to the input dtype only for the MXU matmul.
        rows = xs[ky][0].astype(jnp.float32)  # (TH, Wp, C)
        # Stack the kx taps along the channel axis by STORING each shifted
        # slice into the staging buffer (value-level concat of differently-
        # offset slices is not lowerable on Mosaic).
        for kx in range(k):
            stage_ref[:, :, kx * c_in : (kx + 1) * c_in] = rows[
                :, kx * d : kx * d + w_out, :
            ]
        stacked = stage_ref[:].reshape(th * w_out, k * c_in).astype(o_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            stacked,
            w_ref[ky],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc_ref[:].reshape(th, w_out, -1).astype(o_ref.dtype)


def _conv_same_fwd(x: jnp.ndarray, w: jnp.ndarray, dilation: int) -> jnp.ndarray:
    b, h, wd, c_in = x.shape
    k = w.shape[0]
    c_out = w.shape[-1]
    p = dilation * (k - 1) // 2
    wp = wd + 2 * p
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    th = _pick_tile_h(h, wp, c_in, c_out, k, x.dtype.itemsize)

    # k row-shifted views: view ky tiled at (bi, hi) yields exactly the input
    # rows tap ky needs for output rows [hi*th, hi*th+th)
    views = [
        jax.lax.slice_in_dim(xp, ky * dilation, ky * dilation + h, axis=1) for ky in range(k)
    ]
    # (k, k, C, C_out) -> (k, k*C, C_out): per-ky tap-stacked weight slabs
    wk = w.reshape(k, k * c_in, c_out).astype(x.dtype)

    kernel = functools.partial(_conv_kernel, k=k, d=dilation, th=th, w_out=wd, c_in=c_in)
    x_spec = pl.BlockSpec(
        (1, th, wp, c_in), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c_out), x.dtype),
        grid=(b, h // th),
        in_specs=[x_spec] * k
        + [
            pl.BlockSpec(
                (k, k * c_in, c_out), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, th, wd, c_out), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th, wd, k * c_in), jnp.float32),
            pltpu.VMEM((th * wd, c_out), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*views, wk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_same_small(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Stride-1 'same' conv: x (B,H,W,Cin), w (k,k,Cin,Cout) -> (B,H,W,Cout)."""
    return _conv_same_fwd(x, w, dilation)


def _fwd(x, w, dilation):
    return _conv_same_fwd(x, w, dilation), (x, w)


def _bwd(dilation, res, g):
    x, w = res
    # dx: same-pad conv of g with the spatially-flipped, io-transposed kernel
    w_flip = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    dx = _conv_same_fwd(g, w_flip, dilation)
    # dw via XLA (training-only path; negligible in PGD which needs dx only)
    _, vjp_w = jax.vjp(
        lambda wv: jax.lax.conv_general_dilated(
            x,
            wv,
            (1, 1),
            [(dilation * (w.shape[0] - 1) // 2,) * 2] * 2,
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        w,
    )
    (dw,) = vjp_w(g)
    return dx, dw


conv2d_same_small.defvjp(_fwd, _bwd)
