"""Mix Vision Transformer (SegFormer MiT-b0..b5) encoder, NHWC.

Reference semantics: core/mix_transformer.py (NVIDIA SegFormer encoder).
  * 4 stages of OverlapPatchEmbed (k7s4 then k3s2) + pre-norm blocks with
    spatial-reduction attention (sr_ratio 8/4/2/1 shrinks K/V via a strided
    conv + LayerNorm) and Mix-FFN (fc1 -> 3x3 depthwise -> GELU -> fc2).
  * Block/stage LayerNorms use eps 1e-6; patch-embed and SR LayerNorms use
    the torch default 1e-5. GELU is exact (erf), not tanh-approximate.
  * DropPath (stochastic depth) linearly ramps to drop_path_rate; identity
    at eval.

TPU notes: attention stays as batched einsum — at 480x640 the largest
attention is (19200 x 300) per head, which XLA tiles onto the MXU directly;
a fused Pallas path is provided in paif_tpu.ops.pallas for the hot stages.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from paif_tpu.nn.layers import get_precision
from paif_tpu.ops.pallas.sr_attention import pallas_attention_enabled, sr_attention


# Odd minimax-style polynomial for Phi(t) - 0.5 = erf(t/sqrt(2))/2 on
# [-4, 4], fitted with ~relative-error weighting on gelu(x) = x*Phi(x).
# Outside [-4, 4] the kernel SELECTS the exact asymptotes (x above, 0
# below) rather than extrapolating the clamp — without the selects the
# negative tail leaks ~1.6e-4*x linearly. Verified globally on
# [-30, 30]: max |gelu_poly - gelu_erf| = 7.2e-4 (boundary x~±4; tails
# 1.3e-4 = |gelu(±4)| itself); on N(0,1.5) activations ~94% of bf16
# outputs round identically to exact erf and the rest differ by one
# final ulp. 8 FMAs + 2 selects, no transcendental — ~1.6x cheaper than
# XLA's rational erf on the VPU (1.33 vs 2.18 ms at stage-1 B16).
_GELU_COEFS = (
    3.9893424096e-01,
    -6.6402491761e-02,
    9.8319508741e-03,
    -1.1016040935e-03,
    8.9346183982e-05,
    -4.8511240139e-06,
    1.5456717779e-07,
    -2.1538970845e-09,
)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU: exact (erf, f32) on the parity path; polynomial Phi on the
    bf16 fast path.

    Measured on v5e (scripts/bench_ffn.py): erf on a *bf16* tensor sitting
    between the Mix-FFN depthwise conv and the fc2 matmul triggers a
    pathological XLA lowering — the fc1+dwconv+gelu+fc2 chain runs ~6.5x
    slower (7.5 ms vs 1.15 ms net at stage-3 shapes, batch 8). Upcasting
    just the GELU to f32 (or a barrier after the conv) removes it entirely.
    For f32 inputs the casts are no-ops, so reference parity is unchanged.

    Fast path (bf16 inputs under PAIF_PRECISION=default): GELU is the
    encoder's single largest VPU cost (~1.5 ms per stage-1 Mix-FFN at B16,
    scripts/bench_stage1.py — ~860M activations per forward). The
    polynomial Phi keeps the f32 arithmetic (dodging the bf16-erf
    lowering) but replaces the ~25-op rational erf with 8 FMAs; the
    result is within one bf16 ulp of exact erf everywhere (see
    _GELU_COEFS). torch.nn.GELU default is exact erf (mix_transformer.py
    Mlp), so the PARITY path must not use tanh/poly approximations.
    """
    if x.dtype == jnp.float32 or get_precision() != jax.lax.Precision.DEFAULT:
        # parity semantics (f32 tensors, or PAIF_PRECISION=highest/high
        # with bf16 data): exact erf in f32.
        return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    # Estrin evaluation: the 8-FMA Horner chain is latency-bound on the
    # VPU and measures as slow as XLA's erf (2.17 vs 2.18 ms at stage-1
    # B16 shapes); the Estrin regrouping exposes 4-way ILP and runs 1.33
    # ms vs tanh-form's 1.16 with a tighter error bound.
    c = [jnp.float32(v) for v in _GELU_COEFS]
    xf = x.astype(jnp.float32)
    t = jnp.clip(xf, -4.0, 4.0)
    t2 = t * t
    t4 = t2 * t2
    t8 = t4 * t4
    q = (c[0] + c[1] * t2 + t4 * (c[2] + c[3] * t2)) + t8 * (
        c[4] + c[5] * t2 + t4 * (c[6] + c[7] * t2)
    )
    p = xf * (0.5 + t * q)
    # exact asymptotes outside the fit range (see _GELU_COEFS note)
    out = jnp.where(xf > 4.0, xf, jnp.where(xf < -4.0, 0.0, p))
    return out.astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class SRAttention(nn.Module):
    """Attention with spatial reduction of K/V (mix_transformer.py:56-115).

    use_pallas=None -> auto: the fused Pallas kernel on TPU (keeps the NxM
    score matrix in VMEM), plain einsums elsewhere.
    """

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5

        q = nn.Dense(c, use_bias=self.qkv_bias, precision=get_precision(), name="q")(x)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio
            xs = x.reshape(b, h, w, c)
            xs = nn.Conv(
                c,
                kernel_size=(r, r),
                strides=(r, r),
                padding="VALID",
                precision=get_precision(),
                name="sr",
            )(xs)
            kv_in = xs.reshape(b, -1, c)
            kv_in = nn.LayerNorm(epsilon=1e-5, name="sr_norm")(kv_in)

        kv = nn.Dense(c * 2, use_bias=self.qkv_bias, precision=get_precision(), name="kv")(kv_in)
        m = kv.shape[1]
        kv = kv.reshape(b, m, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = pallas_attention_enabled()
        if use_pallas:
            m_len = k.shape[2]
            out = sr_attention(
                q.reshape(b * nh, n, hd), k.reshape(b * nh, m_len, hd),
                v.reshape(b * nh, m_len, hd), scale,
            ).reshape(b, nh, n, hd)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=get_precision()) * scale
            attn = nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=get_precision())
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, precision=get_precision(), name="proj")(out)


class MixFFN(nn.Module):
    """fc1 -> 3x3 depthwise conv -> GELU -> fc2 (mix_transformer.py:18-53)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        x = nn.Dense(self.hidden, precision=get_precision(), name="fc1")(x)
        xs = x.reshape(b, h, w, self.hidden)
        xs = nn.Conv(
            self.hidden,
            kernel_size=(3, 3),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.hidden,
            use_bias=True,
            precision=get_precision(),
            name="dwconv",
        )(xs)
        x = xs.reshape(b, n, self.hidden)
        x = _gelu(x)
        return nn.Dense(self.dim, precision=get_precision(), name="fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int], deterministic: bool = True) -> jnp.ndarray:
        dp = DropPath(self.drop_path, name="drop_path")
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + dp(SRAttention(self.dim, self.num_heads, self.sr_ratio, name="attn")(y, hw), deterministic)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + dp(MixFFN(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(y, hw), deterministic)
        return x


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch_size: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int]]:
        p = self.patch_size // 2
        x = nn.Conv(
            self.dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=True,
            precision=get_precision(),
            name="proj",
        )(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x, (h, w)


MIT_CONFIGS = {
    # name: (embed_dims, num_heads, depths, sr_ratios, mlp_ratios, drop_path)
    "mit_b0": ((32, 64, 160, 256), (1, 2, 5, 8), (2, 2, 2, 2), (8, 4, 2, 1), (4, 4, 4, 4), 0.1),
    "mit_b1": ((64, 128, 320, 512), (1, 2, 5, 8), (2, 2, 2, 2), (8, 4, 2, 1), (4, 4, 4, 4), 0.1),
    "mit_b2": ((64, 128, 320, 512), (1, 2, 5, 8), (3, 4, 6, 3), (8, 4, 2, 1), (4, 4, 4, 4), 0.1),
    "mit_b3": ((64, 128, 320, 512), (1, 2, 5, 8), (3, 4, 18, 3), (8, 4, 2, 1), (4, 4, 4, 4), 0.1),
    "mit_b4": ((64, 128, 320, 512), (1, 2, 5, 8), (3, 8, 27, 3), (8, 4, 2, 1), (4, 4, 4, 4), 0.1),
    "mit_b5": ((64, 128, 320, 512), (1, 2, 5, 8), (3, 6, 40, 3), (8, 4, 2, 1), (4, 4, 4, 4), 0.1),
}


class MixVisionTransformer(nn.Module):
    """Returns the 4-scale NHWC feature pyramid [stride 4, 8, 16, 32]."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    depths: Sequence[int] = (3, 4, 18, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    drop_path_rate: float = 0.1
    # Rematerialize transformer blocks in the backward pass: activation
    # memory drops from O(depth) to O(1) blocks — required to fit batched
    # PGD (fwd+bwd per attack step) in HBM at 480x640.
    #   False        -> no remat
    #   True         -> remat every block (max memory savings, ~2x fwd FLOPs
    #                   in the backward)
    #   (0, 1, ...)  -> remat only those stages (0-indexed). The activation
    #                   bytes live in stages 0-1 (19200/4800 tokens) while
    #                   ~70% of the encoder FLOPs live in stage 2 (18 blocks
    #                   at b3), so remat=(0, 1) keeps PGD in HBM at a
    #                   fraction of full-remat's recompute cost.
    remat: bool | Tuple[int, ...] = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        # static_argnums indexes the bound call (0 = module): mark the hw
        # tuple (2) and the deterministic flag (3) static.
        remat_block = nn.remat(Block, static_argnums=(2, 3))
        outs = []
        cur = 0
        for s in range(4):
            if self.remat is True:
                block_cls = remat_block
            elif self.remat and s in self.remat:
                block_cls = remat_block
            else:
                block_cls = Block
            patch, stride = (7, 4) if s == 0 else (3, 2)
            tokens, (h, w) = OverlapPatchEmbed(
                self.embed_dims[s], patch, stride, name=f"patch_embed{s + 1}"
            )(x)
            for i in range(self.depths[s]):
                tokens = block_cls(
                    self.embed_dims[s],
                    self.num_heads[s],
                    self.mlp_ratios[s],
                    self.sr_ratios[s],
                    dpr[cur + i],
                    name=f"block{s + 1}_{i}",
                )(tokens, (h, w), not train)
            cur += self.depths[s]
            tokens = nn.LayerNorm(epsilon=1e-6, name=f"norm{s + 1}")(tokens)
            x = tokens.reshape(tokens.shape[0], h, w, self.embed_dims[s])
            outs.append(x)
        return outs


def mit(
    name: str,
    drop_path_rate: float | None = None,
    remat: bool | Tuple[int, ...] = False,
) -> MixVisionTransformer:
    dims, heads, depths, srs, mlps, dpr = MIT_CONFIGS[name]
    return MixVisionTransformer(
        embed_dims=dims,
        num_heads=heads,
        depths=depths,
        sr_ratios=srs,
        mlp_ratios=mlps,
        drop_path_rate=dpr if drop_path_rate is None else drop_path_rate,
        remat=remat,
    )
