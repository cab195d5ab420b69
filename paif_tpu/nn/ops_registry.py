"""The searchable op library: 7 cell ops keyed exactly as the reference OPS
dict (operations_m.py:9-18), plus the op-string parser used by genotypes
(model_fusion_auto.py:397-412: "Name_kernel[_dilation]"; attention ops carry
only a kernel field, which SelAttention interprets as the head count).

Reference quirks preserved deliberately (they shape the published weights):
  * ResidualDenseBlock returns x3*0.333333 + x (operations_m.py:449).
  * Each block's nn.PReLU() is ONE scalar shared across every application
    inside that block (named "act" here).
  * ECA/SPA blocks residual-add the *conv1 output*, not the block input
    (operations_m.py:381-393: `out = x = self.conv1(x)`).
  * ECABasicBlock/Spatial_BasicBlock ignore the dilation argument for conv2.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import (
    get_precision,
    BasicConv,
    BatchNorm,
    Conv,
    Conv3x3,
    PReLU,
    channel_pool,
)


class ResidualDenseBlock(nn.Module):
    """'Denseblocks': 3 dense convs, shared PReLU, out = x3/3 + x."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c, k, d = self.features, self.kernel_size, self.dilation
        prelu = PReLU(name="act")
        x1 = prelu(BasicConv(c, k, d, relu=False, name="conv1")(x, train))
        x2 = prelu(BasicConv(c, k, d, relu=False, name="conv2")(jnp.concatenate([x, x1], -1), train))
        x3 = prelu(BasicConv(c, k, d, relu=False, name="conv3")(jnp.concatenate([x, x1, x2], -1), train))
        return x3 * 0.333333 + x


class ResidualModule(nn.Module):
    """'Residualblocks': conv(k,d) -> 3x3 d2 conv -> 1x1 -> BN -> PReLU, +x."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.features
        r = BasicConv(c, self.kernel_size, self.dilation, relu=False, name="conv_a")(x, train)
        r = Conv(c, 3, dilation=2, name="conv_b")(r)
        r = Conv(c, 1, name="conv_c")(r)
        r = BatchNorm(name="norm")(r, use_running_average=not train)
        r = PReLU(name="act")(r)
        return x + r


class ECALayer(nn.Module):
    """Efficient channel attention: GAP -> conv1d(k) over channels -> sigmoid."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from paif_tpu.ops.packed import is_packed

        packed = is_packed()
        if packed:
            c = x.shape[-1] // 4
            y = jnp.mean(x.reshape(*x.shape[:3], c, 4), axis=(1, 2, 4))  # (B, C)
        else:
            y = jnp.mean(x, axis=(1, 2))  # (B, C)
        # 1D conv along the channel axis, 1 in/out feature, no bias
        y = nn.Conv(
            features=1,
            kernel_size=(self.kernel_size,),
            padding=[((self.kernel_size - 1) // 2,) * 2],
            use_bias=False,
            precision=get_precision(),
            name="conv1d",
        )(y[..., None])[..., 0]
        gate = nn.sigmoid(y)
        if packed:
            gate = jnp.repeat(gate, 4, axis=-1)
        return x * gate[:, None, None, :]


class ECABasicBlock(nn.Module):
    """'ECAattention': conv3x3 -> conv(k) -> ECA gate, residual from conv1 out."""

    features: int
    kernel_size: int
    dilation: int = 1  # accepted but unused by conv2, as in the reference

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        prelu = PReLU(name="act")
        y = Conv3x3(self.features, name="conv1")(x)
        out = prelu(y)
        out = BasicConv(self.features, self.kernel_size, relu=False, name="conv2")(out, train)
        out = ECALayer(self.kernel_size, name="se")(out)
        return prelu(out + y)


class SpatialAttnLayer(nn.Module):
    """max/mean channel pool -> conv(2->1, k) -> sigmoid -> x * gate."""

    kernel_size: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from paif_tpu.ops.packed import is_packed, tile_gate_packed

        gate = BasicConv(1, self.kernel_size, relu=False, name="spatial")(channel_pool(x), train)
        gate = nn.sigmoid(gate)
        if is_packed():
            gate = tile_gate_packed(gate, x.shape[-1] // 4)
        return x * gate


class SpatialBasicBlock(nn.Module):
    """'SPAattention': conv3x3 -> conv(k) -> spatial gate, residual from conv1 out."""

    features: int
    kernel_size: int
    dilation: int = 1  # unused by conv2 (reference parity)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        prelu = PReLU(name="act")
        y = Conv3x3(self.features, name="conv1")(x)
        out = prelu(y)
        out = BasicConv(self.features, self.kernel_size, relu=False, name="conv2")(out, train)
        out = SpatialAttnLayer(self.kernel_size, name="se")(out, train)
        return prelu(out + y)


class DilConv(nn.Module):
    """'DilConv': ReLU -> depthwise conv(k,d) -> 1x1 -> BN, plus input residual."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.features
        r = nn.relu(x)
        r = BasicConv(c, self.kernel_size, self.dilation, groups=c, relu=False, name="dw")(r, train)
        r = Conv(c, 1, name="pw")(r)
        r = BatchNorm(name="norm")(r, use_running_average=not train)
        return r + x


class SepConv(nn.Module):
    """'SepConv': two (ReLU -> dw(k) -> pw 1x1 -> BN) stacks, no residual."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c, k = self.features, self.kernel_size
        pad = k // 2
        for i in range(2):
            x = nn.relu(x)
            x = Conv(c, k, groups=c, padding=pad, name=f"dw{i}")(x)
            x = Conv(c, 1, name=f"pw{i}")(x)
            x = BatchNorm(name=f"norm{i}")(x, use_running_average=not train)
        return x


class SelfPath(nn.Module):
    """'SelAttention': conv3x3 -> MHSA over flattened tokens -> LN -> conv3x3.

    The head count comes from the op string's kernel field; dim_head is 64
    (operations_m.py:31-61, 90-112). One PReLU shared across both convs.
    """

    features: int
    num_heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from paif_tpu.ops.packed import is_packed, pack, unpack

        packed = is_packed()
        prelu = PReLU(name="act")
        res = prelu(Conv(self.features, 3, use_bias=True, name="conv_in")(x))
        if packed:
            # the MHSA body needs true (row-major) token order
            res = unpack(res)
        b, h, w, c = res.shape
        tokens = res.reshape(b, h * w, c)
        inner = self.dim_head * self.num_heads
        qkv = nn.Dense(inner * 3, use_bias=False, precision=get_precision(), name="to_qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, h * w, self.num_heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=get_precision()) * (self.dim_head**-0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=get_precision())
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, inner)
        if not (self.num_heads == 1 and self.dim_head == c):
            out = nn.Dense(c, precision=get_precision(), name="to_out")(out)
        out = nn.LayerNorm(name="norm")(out)
        out = out.reshape(b, h, w, c)
        if packed:
            out = pack(out)
        return prelu(Conv(self.features, 3, use_bias=True, name="conv_out")(out))


# Registry keyed exactly like the reference OPS dict (operations_m.py:9-18).
OPS: Dict[str, Callable[..., nn.Module]] = {
    "Denseblocks": lambda c, k, d, name=None: ResidualDenseBlock(c, k, d, name=name),
    "Residualblocks": lambda c, k, d, name=None: ResidualModule(c, k, d, name=name),
    "ECAattention": lambda c, k, d, name=None: ECABasicBlock(c, k, d, name=name),
    "SPAattention": lambda c, k, d, name=None: SpatialBasicBlock(c, k, d, name=name),
    "DilConv": lambda c, k, d, name=None: DilConv(c, k, d, name=name),
    "SepConv": lambda c, k, d, name=None: SepConv(c, k, name=name),
    "SelAttention": lambda c, k, d, name=None: SelfPath(c, num_heads=k, name=name),
}


def parse_op_string(primitive: str) -> Tuple[str, int, int]:
    """'Name_kernel[_dilation]' -> (name, kernel, dilation).

    Attention ops carry only a kernel field (model_fusion_auto.py:404-410).
    """
    parts = primitive.split("_")
    name = parts[0]
    if name not in OPS:
        raise KeyError(f"unknown op '{name}' in '{primitive}' (known: {sorted(OPS)})")
    kernel = int(parts[1])
    dilation = int(parts[2]) if len(parts) > 2 else 1
    return name, kernel, dilation


def make_op(features: int, primitive: str, name: Optional[str] = None) -> nn.Module:
    """Instantiate the op a genotype entry names, e.g. 'Denseblocks_3_1'."""
    op_name, kernel, dilation = parse_op_string(primitive)
    return OPS[op_name](features, kernel, dilation, name=name)
