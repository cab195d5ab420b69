"""Pallas TPU kernel: stride-1 'same' conv2d specialized for SMALL channel
counts (the fusion branch runs C=32 everywhere).

Why: XLA's conv lowering at (8,480,640,32) costs the same wall time for
C=32 as for C=128 (measured 6.3 vs 7.5 ms on v5e) — the 128-lane MXU tiles
are mostly padding. This kernel restructures the conv as ONE tall matmul per
row-tile: the K*K taps are stacked along the contraction axis
((TH*W, ky-chunk of K*C) @ (chunk, C_out), accumulated over ky), so the
contraction dim is K*K*C (288 for 3x3, 1568 for 7x7) instead of C — full
MXU sublanes, and the halo'd input tile is read from HBM exactly once.

Supports dilation (the reference ops use d in {1,2}); fp32 accumulation;
custom VJP (dx via the same kernel with a spatially-flipped, transposed
kernel — exact for stride-1 same conv; dw via XLA, it only matters in
training).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_conv_enabled() -> bool:
    env = os.environ.get("PAIF_PALLAS_CONV")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _pick_tile_h(h: int, budget_rows: int = 16) -> int:
    for th in range(min(budget_rows, h), 0, -1):
        if h % th == 0:
            return th
    return 1


def _conv_kernel(x_ref, w_ref, o_ref, acc_ref, *, k: int, d: int, th: int, w_out: int, c_in: int):
    """One (batch, row-tile) program.

    x_ref: (1, TH + (k-1)*d, Wp, C) halo'd input tile (VMEM)
    w_ref: (k, k*C, C_out) tap-stacked weights (VMEM)
    o_ref: (1, TH, W, C_out) output tile (VMEM)
    acc_ref: (TH*W, C_out) f32 scratch
    """
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for ky in range(k):
        # stack the kx taps of this ky row along the channel axis
        rows = x_ref[0, pl.ds(ky * d, th), :, :]  # (TH, Wp, C)
        taps = [
            jax.lax.dynamic_slice_in_dim(rows, kx * d, w_out, axis=1) for kx in range(k)
        ]
        stacked = jnp.concatenate(taps, axis=-1).reshape(th * w_out, k * c_in)
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
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    th = _pick_tile_h(h)
    halo = (k - 1) * dilation

    # (k, k, C, C_out) -> (k, k*C, C_out): per-ky tap-stacked weight slabs
    wk = w.reshape(k, k * c_in, c_out).astype(x.dtype)

    kernel = functools.partial(
        _conv_kernel, k=k, d=dilation, th=th, w_out=wd, c_in=c_in
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c_out), x.dtype),
        grid=(b, h // th),
        in_specs=[
            # H uses element indexing (pl.Element) so consecutive row tiles
            # OVERLAP by the halo; the other dims stay block-indexed.
            pl.BlockSpec(
                (1, pl.Element(th + halo), wd + 2 * p, c_in),
                lambda bi, hi: (bi, hi * th, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, k * c_in, c_out), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wd, c_out), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((th * wd, c_out), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xp, wk)


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
