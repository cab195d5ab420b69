"""Fused spatial-reduction attention (Pallas TPU kernel).

The SegFormer MiT encoder's attention (mix_transformer.py:94-115) has a long
query axis (up to 19200 tokens at stage 1 for 480x640) but a SHORT key/value
axis (sr_ratio-reduced, <= 300 tokens). The whole K/V block fits in VMEM, so
the fused kernel streams Q tiles from HBM and computes scores+softmax+PV in
one pass per tile — no flash-style online softmax needed, and the (N x M)
score matrix never materializes in HBM (the XLA path writes it out between
the two matmuls at stage 1: 19200 x 304 x heads floats per image).

Gradients: custom VJP recomputing the (cheap) probabilities in XLA. The
kernel runs in interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_attention_enabled() -> bool:
    """Opt-in via PAIF_PALLAS_ATTN=1. Default OFF: at mit_b3 480x640
    batch-16 shapes the fused kernel measured 96 vs 79 ms for the whole
    encoder against XLA's einsum path (scripts/profile_components.py,
    round 2) — XLA's fusion already keeps the (N,300) score tiles local.
    The kernel remains correct and may win at longer K/V; re-measure
    before flipping the default."""
    env = os.environ.get("PAIF_PALLAS_ATTN")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_valid: int):
    q = q_ref[0].astype(jnp.float32)  # (TQ, D)
    k = k_ref[0].astype(jnp.float32)  # (Mp, D)
    v = v_ref[0]  # (Mp, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, Mp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < m_valid, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q: (BH, N, D); k, v: (BH, M, D) -> (BH, N, D)."""
    bh, n, d = q.shape
    m = k.shape[1]
    tq = 256 if n % 256 == 0 else 128
    np_ = _round_up(n, tq)
    mp = _round_up(m, 128)
    dp = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, np_ - n), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, mp - m), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, mp - m), (0, dp - d)))

    kernel = functools.partial(_attn_kernel, scale=scale, m_valid=m)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, np_, dp), q.dtype),
        grid=(bh, np_ // tq),
        in_specs=[
            pl.BlockSpec((1, tq, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sr_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """softmax(q k^T * scale) v with (BH, N, D) q and (BH, M, D) k/v."""
    return _forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    # recompute probabilities (M is small; this is cheap relative to the rest)
    s = jnp.einsum("bnd,bmd->bnm", q, k, precision=jax.lax.Precision.HIGHEST) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bnm,bnd->bmd", p, g, precision=jax.lax.Precision.HIGHEST)
    dp = jnp.einsum("bnd,bmd->bnm", g, v, precision=jax.lax.Precision.HIGHEST)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bnm,bmd->bnd", ds, k, precision=jax.lax.Precision.HIGHEST) * scale
    dk = jnp.einsum("bnm,bnd->bmd", ds, q, precision=jax.lax.Precision.HIGHEST) * scale
    return dq, dk, dv


sr_attention.defvjp(_fwd, _bwd)
