"""Primitive layers (NHWC, flax.linen) with reference-parity semantics.

Reference: operations_m.py (BasicConv padding table :114-145, conv3x3 :283)
and torch defaults this framework must reproduce when importing checkpoints:
  * nn.PReLU() -> ONE shared scalar parameter per module instance.
  * BatchNorm eval mode -> running statistics (use_running_average).
All convolutions default to HIGHEST precision: exact in float32, and still a
single MXU pass when activations/params are bfloat16 (the fast path).

Conv/BatchNorm are factory *functions* returning flax modules so parameter
trees stay flat (e.g. `stem_1/kernel`) — this keeps the torch-checkpoint
importer's key mapping mechanical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

import os

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
# Back-compat constant: the f32-parity default.
PRECISION = jax.lax.Precision.HIGHEST


def get_precision() -> jax.lax.Precision:
    """Matmul/conv precision policy. 'highest' (default) is exact in f32 —
    required for reference parity — and costs multi-pass emulation when
    activations are f32 on TPU. Throughput runs with bf16 params/activations
    should set PAIF_PRECISION=default: a single MXU pass, same bf16 numerics.
    Read per call so benchmarks can flip it without re-importing."""
    return _PRECISIONS[os.environ.get("PAIF_PRECISION", "highest").lower()]


def conv_padding(kernel_size: int, dilation: int = 1) -> int:
    """'Same' padding for odd kernels: reproduces the reference's explicit
    table (operations_m.py:119-132): k3d1->1, k3d2->2, k5d1->2, k5d2->4,
    k7d1->3, k7d2->6; k1 -> 0."""
    return dilation * (kernel_size - 1) // 2


class SmallConv2d(nn.Module):
    """Stride-1 'same' conv with the same parameter tree as nn.Conv
    ('kernel' HWIO + optional 'bias').

    Dispatch:
      * packed layout (ops/packed.py): when the fusion branch runs in 2x2
        space-to-depth form, the input is (B,H/2,W/2,4*c_in) and the conv
        executes as a scattered-kernel conv with 128 unpadded lanes. The
        parameter tree is UNCHANGED (kernel stays (k,k,c_in,features)).
      * lax.conv on plain NHWC otherwise.
    (The round-1 tap-stacked Pallas small-channel kernel was deleted in
    round 3 — subsumed by the packed layout + zconv research; its Mosaic
    pitfall notes live on in docs/MOSAIC.md.)
    """

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = False
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from paif_tpu.ops.packed import conv_same_packed, is_packed

        k = self.kernel_size
        packed = is_packed()
        c_in = x.shape[-1] // 4 if packed else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c_in // self.groups, self.features),
            jnp.float32,
        )
        if kernel.dtype != x.dtype:
            kernel = kernel.astype(x.dtype)
        if packed:
            y = conv_same_packed(x, kernel, self.dilation, groups=self.groups)
        else:
            pad = conv_padding(k, self.dilation)
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                (1, 1),
                [(pad, pad), (pad, pad)],
                rhs_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=get_precision(),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            bias = bias.astype(y.dtype)
            y = y + (jnp.repeat(bias, 4) if packed else bias)
        return y


def Conv(
    features: int,
    kernel_size: int,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = False,
    padding: Optional[int] = None,
    name: Optional[str] = None,
):
    """Square-kernel conv, symmetric 'same' padding by default, HWIO.

    Stride-1 same-padded convs return SmallConv2d, which routes the packed
    (space-to-depth) layout and the opt-in Pallas small-channel kernel
    (identical param tree, so checkpoints/importer are unaffected)."""
    pad = padding if padding is not None else conv_padding(kernel_size, dilation)
    if stride == 1 and pad == conv_padding(kernel_size, dilation):
        return SmallConv2d(
            features=features,
            kernel_size=kernel_size,
            dilation=dilation,
            use_bias=use_bias,
            groups=groups,
            name=name,
        )
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        precision=get_precision(),
        name=name,
    )


def Conv3x3(features: int, stride: int = 1, name: Optional[str] = None) -> nn.Conv:
    """conv3x3 from the reference: 3x3, pad 1, no bias."""
    return Conv(features, 3, stride=stride, use_bias=False, name=name)


class BatchNorm2d(nn.Module):
    """BatchNorm over channels with the same variable tree as nn.BatchNorm
    (params scale/bias, batch_stats mean/var) and torch-compatible eval
    semantics, plus packed-layout awareness: on a (B,H',W',4C) packed tensor
    the statistics are per ORIGINAL channel (params stay (C,)).

    Variance is the biased batch variance for both normalization and the
    running update (flax convention, matching the round-1 nn.BatchNorm
    behavior; torch uses unbiased for the running update — irrelevant for
    imported checkpoints, which only read running stats).
    """

    affine: bool = True
    eps: float = 1e-5
    momentum: float = 0.99  # flax convention: ra = m*ra + (1-m)*batch

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        from paif_tpu.ops.packed import is_packed

        packed = is_packed()
        c = x.shape[-1] // 4 if packed else x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            if packed:
                xr = x32.reshape(*x.shape[:-1], c, 4)
                mean = jnp.mean(xr, axis=(0, 1, 2, 4))
                var = jnp.mean(jnp.square(xr), axis=(0, 1, 2, 4)) - jnp.square(mean)
            else:
                mean = jnp.mean(x32, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.eps)
        off = jnp.zeros_like(mean)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            inv = inv * scale
            off = bias
        if packed:
            mean, inv, off = (jnp.repeat(t, 4) for t in (mean, inv, off))
        return ((x - mean.astype(x.dtype)) * inv.astype(x.dtype) + off.astype(x.dtype)).astype(
            x.dtype
        )


def BatchNorm(
    affine: bool = True,
    eps: float = 1e-5,
    momentum: float = 0.1,
    name: Optional[str] = None,
) -> BatchNorm2d:
    """BatchNorm over the channel axis with torch-compatible defaults.

    Call with `use_running_average=not train`. torch momentum m means
    new = (1-m)*old + m*batch, i.e. flax momentum = 1-m.
    """
    return BatchNorm2d(affine=affine, eps=eps, momentum=1.0 - momentum, name=name)


class PReLU(nn.Module):
    """PReLU with torch semantics: default a single shared scalar (init .25)."""

    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda _key, shape: jnp.full(shape, self.init, dtype=jnp.float32),
            (self.num_parameters,),
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class BasicConv(nn.Module):
    """Reference BasicConv: conv (padding table) + optional BN + optional PReLU.

    operations_m.py:114-145. BN (when enabled) uses eps 1e-5, momentum .01.
    Inner modules are named conv/bn/act.
    """

    features: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    bn: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv(
            self.features,
            self.kernel_size,
            dilation=self.dilation,
            groups=self.groups,
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.bn:
            x = BatchNorm(momentum=0.01, name="bn")(x, use_running_average=not train)
        if self.relu:
            x = PReLU(name="act")(x)
        return x


def channel_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(max, mean) over channels -> (B,H,W,2). operations_m.py:148-150.

    Packed-layout aware: on (B,H',W',4C) input the reductions run per phase
    and the result is the packed form of the plain output (channel order
    stat-major/phase-minor == c-major)."""
    from paif_tpu.ops.packed import channel_reduce_packed, is_packed

    if is_packed():
        return jnp.concatenate(
            [channel_reduce_packed(x, jnp.max), channel_reduce_packed(x, jnp.mean)], axis=-1
        )
    return jnp.concatenate(
        [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)], axis=-1
    )
