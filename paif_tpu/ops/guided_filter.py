"""Guided filter via separable box filters, NHWC.

Reference behavior: guided_filter_pytorch.GuidedFilter(r, eps) as used in
Cell_Decom.decomposition (core/model_fusion_auto.py:522-535) with a
single-channel guide (the per-pixel channel max-min "residue") filtering a
C-channel feature map: He et al.'s fast guided filter with clamped
(shrinking) windows at the borders, normalized by the true per-pixel window
size N.

TPU design notes (round-2 final, after an A/B both ways on the real chip):
  * The 1-D box sum along an axis is a banded ones-matrix product, fed to
    the MXU as a dense (H,H) / (W,W) matmul. Yes, ~98% of that matmul is
    structural zeros — but at these sizes the matmul is *bandwidth*-bound,
    not FLOP-bound, so the dead FLOPs are free. Measured at (8,480,640,32)
    r=4: cumsum/integral image 7.4 s -> depthwise conv 33 ms -> banded
    matmul ~2 ms.
  * The "obvious" fix for the dead FLOPs — 2(2r+1) shifted-slice VPU adds of
    the zero-padded tensor — is 10x WORSE end to end and OOMs the PGD
    backward. Cause: fusion-branch tensors are C=32 minor-dim, which the
    (8,128)-lane tiling pads 4x (150 MB -> 600 MB per temp); every shifted
    add is an unfused 600 MB read+write, and the padded temps blow HBM in
    the attack's backward. Whole-bench effect: 39 -> 24 pairs/s forward,
    PGD OOM (bench run 2026-08-16). The matmul formulation reads the tensor
    once per axis and its transpose (the VJP) is again a banded matmul.
  * `guided_filter_multi_eps` computes the filter for several eps values at
    once: the window moments (mean_g, mean_s, cov_gs, var_g) do not depend
    on eps, so Cell_Decom's two-eps decomposition shares them — 6 box
    passes for two eps instead of 8.
  * Moments of the 1-channel guide stay f32: var = E[g^2] - E[g]^2 is a
    cancellation, f32 there is ~free and keeps the eps=1e-4 branch accurate
    under the bf16 fast path.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _band_matrix(n: int, r: int) -> np.ndarray:
    """(n, n) float32 with M[i, j] = 1 iff |i - j| <= r."""
    idx = np.arange(n)
    return (np.abs(idx[:, None] - idx[None, :]) <= r).astype(np.float32)


def _box_1d(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """1-D box sum (window 2r+1, clamped at borders) along H or W via the
    banded matrix on the MXU. Precision matters: without it the TPU f32
    path runs these einsums as single-pass bf16 (measured 9e-2 abs error on
    window sums), silently breaking the f32 parity contract."""
    from paif_tpu.nn.layers import get_precision

    m = jnp.asarray(_band_matrix(x.shape[axis], r), x.dtype)
    if axis == 1:
        return jnp.einsum("ih,bhwc->biwc", m, x, precision=get_precision())
    return jnp.einsum("jw,bhwc->bhjc", m, x, precision=get_precision())


def box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sum over a (2r+1)x(2r+1) window clamped at image borders.

    x: (B,H,W,C). Returns same shape (window *sums*, not means).
    """
    if x.shape[1] <= 2 * r or x.shape[2] <= 2 * r:
        raise ValueError(f"box_filter radius {r} too large for spatial dims {x.shape[1:3]}")
    return _box_1d(_box_1d(x, r, axis=1), r, axis=2)


def _window_sizes(h: int, w: int, r: int, dtype) -> jnp.ndarray:
    """(1,H,W,1) true clamped-window pixel counts (f32 box of ones).

    Built from a constant inside the trace, so XLA constant-folds it.
    """
    n = box_filter(jnp.ones((1, h, w, 1), jnp.float32), r)
    return n.astype(dtype)


def guided_filter_multi_eps(
    guide: jnp.ndarray, src: jnp.ndarray, r: int, eps_list: Sequence[float]
) -> list[jnp.ndarray]:
    """Guided filter of `src` by `guide` for each eps, sharing window moments.

    guide: (B,H,W,1) or (B,H,W,C); src: (B,H,W,C). Returns [ (B,H,W,C) ].
    A 1-channel guide broadcasts across src channels (the reference's usage).

    Packed-layout aware (ops/packed.py): when the fusion branch runs 2x2
    space-to-depth, guide is (B,H',W',4) and src (B,H',W',4C); broadcasts
    become explicit per-phase tiles and the box sums run as phase-mixing
    banded matmuls with 128 unpadded lanes.
    """
    from paif_tpu.ops.packed import box_filter_packed, is_packed, tile_gate_packed

    packed = is_packed()
    bf = box_filter_packed if packed else box_filter
    _, h, w, _ = guide.shape
    if packed:
        n = bf(jnp.ones((1, h, w, 4), jnp.float32), r)
    else:
        n = bf(jnp.ones((1, h, w, 1), jnp.float32), r)
    inv_n = 1.0 / n
    c = src.shape[-1] // 4 if packed else src.shape[-1]

    def widen(t):
        """Broadcast a guide-width tensor across src channels."""
        return tile_gate_packed(t, c) if packed and t.shape[-1] * c == src.shape[-1] else t

    inv_n_x = widen(inv_n).astype(src.dtype)
    # 1-channel (or guide-width) moments in f32: var_g = E[g^2]-E[g]^2 is a
    # cancellation; f32 here is ~free and keeps the eps=1e-4 branch accurate.
    g32 = guide.astype(jnp.float32)
    mean_g32 = bf(g32, r) * inv_n
    var_g32 = bf(g32 * g32, r) * inv_n - mean_g32 * mean_g32
    mean_g = widen(mean_g32.astype(src.dtype))
    guide_w = widen(guide)
    mean_s = bf(src, r) * inv_n_x
    cov_gs = bf(guide_w * src, r) * inv_n_x - mean_g * mean_s
    outs = []
    for eps in eps_list:
        a = cov_gs * widen((1.0 / (var_g32 + eps)).astype(src.dtype))
        b_ = mean_s - a * mean_g
        mean_a = bf(a, r) * inv_n_x
        mean_b = bf(b_, r) * inv_n_x
        outs.append(mean_a * guide_w + mean_b)
    return outs


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, r: int, eps: float) -> jnp.ndarray:
    """Guided filter of `src` using `guide` (single eps)."""
    return guided_filter_multi_eps(guide, src, r, (eps,))[0]
