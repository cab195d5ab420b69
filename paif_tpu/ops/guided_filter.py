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

import os
from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def fast_gf_enabled() -> bool:
    """PAIF_FAST_GF=1 (nearest a/b upsample) or =2/bilinear: He's fast
    guided filter (subsample 2) on the packed path — 4x less box-filter
    work. OFF by default: it is an approximation (classic fast-GF quality,
    not bit parity); enable on the bf16 fast path once the mIoU drift at
    the operating point is recorded (BASELINE.md)."""
    return os.environ.get("PAIF_FAST_GF", "0") not in ("0", "false", "off")


def fast_gf_bilinear() -> bool:
    return os.environ.get("PAIF_FAST_GF", "0") in ("2", "bilinear")


@lru_cache(maxsize=64)
def _band_matrix(n: int, r: int) -> np.ndarray:
    """(n, n) float32 with M[i, j] = 1 iff |i - j| <= r."""
    idx = np.arange(n)
    return (np.abs(idx[:, None] - idx[None, :]) <= r).astype(np.float32)


@lru_cache(maxsize=64)
def _counts_1d(n: int, r: int) -> np.ndarray:
    """Clamped window sizes along one axis: min(i+r, n-1) - max(i-r, 0) + 1."""
    i = np.arange(n)
    return (np.minimum(i + r, n - 1) - np.maximum(i - r, 0) + 1).astype(np.float32)


@lru_cache(maxsize=64)
def window_counts(h: int, w: int, r: int, packed: bool) -> np.ndarray:
    """Analytic box_filter(ones): N[i,j] = nh[i] * nw[j], (1,h,w,1) — or the
    2x2-packed (1,h/2,w/2,4) view when `packed`. Replaces a full box pass
    (the reference materializes N = boxfilter(ones) per call,
    guided_filter_pytorch GuidedFilter.forward); here it is a host-side
    constant — box-of-ones is separable and data-independent."""
    n2 = np.outer(_counts_1d(h, r), _counts_1d(w, r)).astype(np.float32)[None, :, :, None]
    if not packed:
        return n2
    return (
        n2.reshape(1, h // 2, 2, w // 2, 2, 1)
        .transpose(0, 1, 3, 5, 2, 4)
        .reshape(1, h // 2, w // 2, 4)
    )


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


def _box_dense_c1(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Box sum of a 1-channel (B,H,W,1) map with W as the MINOR dim.

    The NHWC form puts C=1 minor, which the (8,128)-lane tiling pads 128x —
    every band matmul then moves/computes 128x dead lanes. Squeezing C and
    running the band matmuls on (B,H,W) makes W the lane dim (dense), which
    measures ~3x faster at the flagship guide shapes and is exact (same
    per-axis banded sums, different physical layout)."""
    from paif_tpu.nn.layers import get_precision

    g = x[..., 0]
    mh = jnp.asarray(_band_matrix(g.shape[1], r), g.dtype)
    mw = jnp.asarray(_band_matrix(g.shape[2], r), g.dtype)
    y = jnp.einsum("ih,bhw->biw", mh, g, precision=get_precision())
    y = jnp.einsum("jw,biw->bij", mw, y, precision=get_precision())
    return y[..., None]


def box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sum over a (2r+1)x(2r+1) window clamped at image borders.

    x: (B,H,W,C). Returns same shape (window *sums*, not means).
    """
    if x.shape[1] <= 2 * r or x.shape[2] <= 2 * r:
        raise ValueError(f"box_filter radius {r} too large for spatial dims {x.shape[1:3]}")
    if x.shape[-1] == 1:
        return _box_dense_c1(x, r)
    return _box_1d(_box_1d(x, r, axis=1), r, axis=2)


def guided_filter_multi_eps(
    guide: jnp.ndarray, src: jnp.ndarray, r: int, eps_list: Sequence[float]
) -> list[jnp.ndarray]:
    """Guided filter of `src` by `guide` for each eps, sharing window moments.

    guide: (B,H,W,1) or (B,H,W,C); src: (B,H,W,C). Returns [ (B,H,W,C) ].
    A 1-channel guide broadcasts across src channels (the reference's usage).

    Packed-layout aware (ops/packed.py): when the fusion branch runs 2x2
    space-to-depth, guide is (B,H',W',4) and src (B,H',W',4C); broadcasts
    become explicit per-phase tiles and the box sums run as phase-mixing
    banded matmuls with 128 unpadded lanes (Pallas VPU kernel at r=4
    full-width shapes).

    Differentiation goes through an analytic custom VJP: the backward costs
    exactly 6 src-width box sums (same as the forward) and saves only the
    window moments — autodiff through the Pallas box's custom-vjp barrier
    would instead save every intermediate (+3.4 GB HBM in the batch-8 PGD
    step), and jax.checkpoint would recompute the whole forward.
    """
    from paif_tpu.ops.packed import is_packed

    packed = is_packed()
    if (
        packed
        and fast_gf_enabled()
        and r % 2 == 0
        and guide.shape[1] % 2 == 0
        and guide.shape[2] % 2 == 0
    ):
        return _fast_gf_packed(guide, src, r, tuple(eps_list))
    return list(_gf_vjp(packed, r, tuple(eps_list), guide, src))


def _fast_gf_packed(guide, src, r, eps_list):
    """He's FAST guided filter (ECCV'10 Sec. 6 / arXiv:1505.00996) on the
    packed layout: moments and (a, b) computed on the 2x-subsampled grid
    (phase-mean pool), then nearest-upsampled and combined with the FULL-
    resolution guide. The subsampled per-channel image re-packs to the
    same 128-lane layout at quarter area, so every box sum runs 4x
    cheaper (radius r//2 — the Pallas kernel's r=2 case).

    Pixel-for-pixel the subsampled grid IS the packed block grid: the
    nearest upsample of a low-res map to full-res packed form is a plain
    per-channel lane broadcast (repeat 4), and the whole path is ordinary
    differentiable XLA + the symmetric-VJP box kernel — no custom VJP
    machinery needed at these sizes.
    """
    from paif_tpu.ops.packed import pack, tile_gate_packed, unpack

    b, hp, wp_, c4 = src.shape
    c = c4 // 4
    # subsample: 2x2 phase-mean (anti-aliased, 1 pass each)
    g_lr = jnp.mean(guide, axis=-1, keepdims=True)
    s_lr = jnp.mean(src.reshape(b, hp, wp_, c, 4), axis=-1)
    g_p, s_p = pack(g_lr), pack(s_lr)
    r2 = r // 2
    bf, widen, _ = _helpers(True, c4, 4)
    n = jnp.asarray(window_counts(hp, wp_, r2, True))
    inv_n = 1.0 / n
    inv_n_x = widen(inv_n).astype(src.dtype)
    g32 = g_p.astype(jnp.float32)
    mean_g32 = bf(g32, r2) * inv_n
    var_g32 = bf(g32 * g32, r2) * inv_n - mean_g32 * mean_g32
    mean_g = widen(mean_g32.astype(src.dtype))
    guide_w_lr = widen(g_p)
    mean_s = bf(s_p, r2) * inv_n_x
    cov_gs = bf(guide_w_lr * s_p, r2) * inv_n_x - mean_g * mean_s
    guide_w = tile_gate_packed(guide, c)
    outs = []
    for eps in eps_list:
        a = cov_gs * widen((1.0 / (var_g32 + eps)).astype(src.dtype))
        b_ = mean_s - a * mean_g
        mean_a = bf(a, r2) * inv_n_x
        mean_b = bf(b_, r2) * inv_n_x
        if fast_gf_bilinear():
            from paif_tpu.ops.resize import resize_bilinear

            up = lambda t: pack(  # noqa: E731
                resize_bilinear(unpack(t), (2 * hp, 2 * wp_), align_corners=False)
            )
        else:
            # nearest: low-res map -> full-res packed is a lane broadcast
            up = lambda t: jnp.repeat(unpack(t), 4, axis=-1)  # noqa: E731
        outs.append(up(mean_a) * guide_w + up(mean_b))
    return outs


def _helpers(packed: bool, src_width: int, guide_width: int, allow_pallas: bool = True):
    """(bf, widen, unwiden) for one layout/shape combo.

    allow_pallas=False forces the einsum box (used by the differentiated
    path: the Pallas custom call is a fusion barrier, and inside the PGD
    fwd+bwd graph the MXU einsum form measures faster end to end).
    """
    from paif_tpu.ops.packed import box_filter_packed, tile_gate_packed

    if packed:
        bf = lambda x, r: box_filter_packed(x, r, allow_pallas=allow_pallas)  # noqa: E731
    else:
        bf = box_filter
    c = src_width // 4 if packed else src_width

    def widen(t):
        """Broadcast a guide-width tensor across src channels."""
        return tile_gate_packed(t, c) if packed and t.shape[-1] * c == src_width else t

    def unwiden(t):
        """Adjoint of widen: reduce a src-width cotangent to guide width.

        Packed route: a (4C,4) 0/1 lane-selection MATMUL instead of the
        reshape(...,C,4).sum(-2) stride-4 cross-lane reduction — the
        reshape form is a relayout-class op on TPU (measured 1.40 vs 0.33
        ms per call at (16,240,320,128) bf16, bench_logs/r5/widen_ops.log).
        """
        if t.shape[-1] == guide_width:
            return t
        if packed:
            if os.environ.get("PAIF_UNWIDEN_MM", "1") not in ("0", "false", "off"):
                from paif_tpu.nn.layers import get_precision

                sel = _phase_select(t.shape[-1])
                return jnp.einsum(
                    "...l,lp->...p", t, jnp.asarray(sel, t.dtype), precision=get_precision()
                )
            return t.reshape(*t.shape[:-1], c, 4).sum(-2)
        return t.sum(-1, keepdims=True)

    return bf, widen, unwiden


@lru_cache(maxsize=8)
def _phase_select(c4: int) -> np.ndarray:
    """(4C,4) 0/1 matrix: column p selects lanes with phase l%4 == p."""
    sel = np.zeros((c4, 4), np.float32)
    sel[np.arange(c4), np.arange(c4) % 4] = 1.0
    return sel


def _gf_forward(packed, r, eps_list, guide, src, allow_pallas=True, diff_fused=False):
    """Returns (outs tuple, residuals) — the shared-moment forward.

    On the packed primal path the six src-width box sums run as FUSED
    multi-tensor Pallas calls (ops/pallas/box_filter.py round-3 kernels):
    stage A boxes src and guide*src in one pass pair with the product
    computed in VMEM (the reference's mean_x/mean_xy moments,
    guided_filter_pytorch GuidedFilter.forward), stage B boxes each eps's
    (a, b) pair per call. Differentiated paths default to the einsum boxes
    (the custom-call fusion barrier loses there); diff_fused=True (the
    PAIF_PALLAS_BOX_DIFF knob) opts the differentiated forward into the
    FUSED kernels specifically — never the single-tensor ones, whose
    in-graph config is a known measured regression.
    """
    from paif_tpu.ops.pallas.box_filter import (
        box_multi_packed_pallas,
        box_pair_prod_packed_pallas,
        fused_boxes_applicable,
        pallas_box_applicable,
    )

    bf, widen, _ = _helpers(packed, src.shape[-1], guide.shape[-1], allow_pallas)
    _, h, w, _ = guide.shape
    n = jnp.asarray(window_counts(2 * h if packed else h, 2 * w if packed else w, r, packed))
    inv_n = 1.0 / n
    inv_n_x = widen(inv_n).astype(src.dtype)
    # 1-channel (or guide-width) moments in f32: var_g = E[g^2]-E[g]^2 is a
    # cancellation; f32 here is ~free and keeps the eps=1e-4 branch accurate.
    g32 = guide.astype(jnp.float32)
    mean_g32 = bf(g32, r) * inv_n
    var_g32 = bf(g32 * g32, r) * inv_n - mean_g32 * mean_g32
    mean_g = widen(mean_g32.astype(src.dtype))
    guide_w = widen(guide)
    fused = (
        packed
        and (allow_pallas or diff_fused)
        and guide_w.shape == src.shape
        and pallas_box_applicable(src.shape, r)
        and fused_boxes_applicable(src.shape, r, ignore_env=diff_fused)
    )
    if fused:
        s_s, s_gs = box_pair_prod_packed_pallas(src, guide_w, r)
        mean_s = s_s * inv_n_x
        cov_gs = s_gs * inv_n_x - mean_g * mean_s
    else:
        mean_s = bf(src, r) * inv_n_x
        cov_gs = bf(guide_w * src, r) * inv_n_x - mean_g * mean_s
    ks = [widen((1.0 / (var_g32 + eps)).astype(src.dtype)) for eps in eps_list]
    if fused and fused_stageb_enabled():
        from paif_tpu.ops.pallas.box_filter import box_gf_stageb_packed_pallas

        # per-eps (a, b) formed in the kernel's VMEM — see stage-B kernel
        boxed = box_gf_stageb_packed_pallas(cov_gs, mean_s, mean_g, ks, r)
    else:
        a_bs = []
        for k in ks:
            a = cov_gs * k
            a_bs.extend([a, mean_s - a * mean_g])
        boxed = box_multi_packed_pallas(a_bs, r) if fused else [bf(t, r) for t in a_bs]
    outs = []
    mean_as = []
    for i in range(len(eps_list)):
        mean_a = boxed[2 * i] * inv_n_x
        mean_b = boxed[2 * i + 1] * inv_n_x
        mean_as.append(mean_a)
        outs.append(mean_a * guide_w + mean_b)
    res = (guide, src, mean_g32, var_g32, mean_s, cov_gs, tuple(mean_as))
    return tuple(outs), res


def pallas_box_diff_enabled() -> bool:
    """PAIF_PALLAS_BOX_DIFF: let the DIFFERENTIATED guided-filter paths
    (custom-vjp fwd + analytic bwd — the PGD/AAT hot loop) use the fused
    Pallas box kernels instead of einsum band matmuls. Default ON since the
    round-4 on-chip A/B (bench_logs/r4/pgd_sweep_densedw.log): attacked
    pairs/s at B16 PGD-5 is 5.88 vs 5.70 (no-remat) and 5.71 vs 5.66
    (full remat). The round-2 regression (einsum 5.36 vs single-tensor
    Pallas 5.0) was the single-tensor kernels; the round-3 fused multi-
    tensor launches + the round-4 dense depthwise fix reversed it."""
    return os.environ.get("PAIF_PALLAS_BOX_DIFF", "1") not in ("0", "false", "off")


def fused_stageb_enabled() -> bool:
    """PAIF_FUSED_GF_STAGEB: form the per-eps (a, b) stage-B coefficients
    inside the fused box kernel's VMEM instead of materializing four
    src-width HBM temps per call. Applies to both the primal forward and
    the fused differentiated forward."""
    return os.environ.get("PAIF_FUSED_GF_STAGEB", "1") not in ("0", "false", "off")


def fused_prod_bwd_enabled() -> bool:
    """PAIF_FUSED_GF_PROD: compute the GF backward's cotangent pre-products
    (ybar*guide*inv_n, ybar*inv_n — four src-width HBM temps at B16, 315 MB
    each) inside the fused box kernels' VMEM instead of materializing them.
    Only reachable when the fused diff path (PAIF_PALLAS_BOX_DIFF) is
    active."""
    return os.environ.get("PAIF_FUSED_GF_PROD", "1") not in ("0", "false", "off")


def _gf_backward(packed, r, eps_list, res, cots):
    """Analytic VJP: 6 src-width box sums + 2 guide-width, zero recompute.

    Einsum boxes by default: inside the big differentiated graph the MXU
    form fuses with the surrounding elementwise chains. With
    PAIF_PALLAS_BOX_DIFF the six src-width sums run as 3 fused Pallas pass
    pairs (the per-eps (d_a, d_b) cotangent sums are all available at once,
    and the final (d_cov, d_ms) pair likewise).
    """
    from paif_tpu.ops.pallas.box_filter import (
        box_multi_packed_pallas,
        box_multi_prod_packed_pallas,
        fused_boxes_applicable,
        pallas_box_applicable,
    )

    guide, src, mean_g32, var_g32, mean_s, cov_gs, mean_as = res
    # einsum boxes for anything not fused — the single-tensor Pallas kernel
    # inside a differentiated graph is a known measured regression
    bf, widen, unwiden = _helpers(packed, src.shape[-1], guide.shape[-1], allow_pallas=False)
    _, h, w, _ = guide.shape
    dt = src.dtype
    n = jnp.asarray(window_counts(2 * h if packed else h, 2 * w if packed else w, r, packed))
    inv_n = 1.0 / n
    inv_n_x = widen(inv_n).astype(dt)
    mean_g = widen(mean_g32.astype(dt))
    guide_w = widen(guide)
    fused = (
        packed
        and pallas_box_diff_enabled()
        and pallas_box_applicable(src.shape, r)
        and fused_boxes_applicable(src.shape, r, ignore_env=True)
    )
    box_group = (
        (lambda ts: box_multi_packed_pallas(ts, r)) if fused else (lambda ts: [bf(t, r) for t in ts])
    )

    d_gw = jnp.zeros_like(guide_w)
    d_ms = jnp.zeros_like(mean_s)
    d_mgx = jnp.zeros_like(mean_g)
    d_cov = jnp.zeros_like(cov_gs)
    d_var = jnp.zeros_like(var_g32)
    # All per-eps cotangent pre-products exist up front: box them together.
    # (guide * inv_n) is widened ONCE — associativity of the pre-product,
    # one src-width multiply per tensor instead of two (r5 glue reduction,
    # bench_logs/r5/gf_grad_bisect.log: 30.4 ms of the 46.2 ms backward is
    # elementwise passes).
    gin = widen(guide * inv_n.astype(dt))
    prod_fused = fused and fused_prod_bwd_enabled()
    if prod_fused:
        # products in the kernel's VMEM: x-major gate-minor order matches
        # the [ybar*gin, ybar*inv_n] per-eps list below
        boxed = box_multi_prod_packed_pallas(list(cots), [gin, inv_n_x], r)
    else:
        boxed = box_group([t for ybar in cots for t in (ybar * gin, ybar * inv_n_x)])
    for i, (eps, ybar, mean_a) in enumerate(zip(eps_list, cots, mean_as)):
        k32 = 1.0 / (var_g32 + eps)
        k = widen(k32.astype(dt))
        a = cov_gs * k
        d_gw = d_gw + ybar * mean_a
        d_a = boxed[2 * i]  # through mean_a = bf(a)*inv_n
        d_b = boxed[2 * i + 1]  # through mean_b = bf(b)*inv_n
        # b = mean_s - a*mean_g
        d_ms = d_ms + d_b
        d_a = d_a - d_b * mean_g
        d_mgx = d_mgx - d_b * a
        # a = cov * k ; k is constant across the C copies within a phase, so
        # one k factors OUT of the unwiden sum: unwiden(t*cov*k) * k32 ==
        # unwiden(t*cov*k*k) with 2 fewer src-width multiplies
        t = d_a * k
        d_cov = d_cov + t
        d_var = d_var - k32 * unwiden((t * cov_gs).astype(jnp.float32))
    # cov = bf(gw*src)*inv_n - mean_g*mean_s ; mean_s = bf(src)*inv_n
    d_ms_f = d_ms - d_cov * mean_g
    if prod_fused:
        d_t, d_s2 = box_multi_prod_packed_pallas([d_cov, d_ms_f], [inv_n_x], r)
    else:
        d_t, d_s2 = box_group([d_cov * inv_n_x, d_ms_f * inv_n_x])
    d_gw = d_gw + d_t * src
    d_src = d_t * guide_w
    d_mgx = d_mgx - d_cov * mean_s
    d_src = d_src + d_s2
    # mean_g (widened, dt) <- mean_g32 (f32)
    d_m32 = unwiden(d_mgx.astype(jnp.float32))
    # var = bf(g32^2)*inv_n - mean_g32^2
    d_m32 = d_m32 - 2.0 * mean_g32 * d_var
    g32 = guide.astype(jnp.float32)
    # the two guide-width f32 boxes are independent: one batch-stacked call
    bv, bm = jnp.split(bf(jnp.concatenate([d_var * inv_n, d_m32 * inv_n], axis=0), r), 2, axis=0)
    d_g32 = 2.0 * g32 * bv + bm
    # guide enters via g32 and guide_w
    d_guide = d_g32.astype(guide.dtype) + unwiden(d_gw)
    return d_guide, d_src


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gf_vjp(packed, r, eps_list, guide, src):
    # The packed flag is a STATIC argument captured at forward-trace time:
    # the layout context manager has already exited when JAX traces the
    # backward, so the bwd must not consult the global flag.
    return _gf_forward(packed, r, eps_list, guide, src)[0]


def _gf_fwd(packed, r, eps_list, guide, src):
    # Only reached when the filter is being differentiated: einsum boxes by
    # default so XLA can fuse the fwd into the surrounding gradient graph;
    # PAIF_PALLAS_BOX_DIFF routes this too through the FUSED Pallas kernels
    # (never the single-tensor ones — see _gf_forward docstring).
    return _gf_forward(
        packed, r, eps_list, guide, src, allow_pallas=False, diff_fused=pallas_box_diff_enabled()
    )


_gf_vjp.defvjp(_gf_fwd, _gf_backward)


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, r: int, eps: float) -> jnp.ndarray:
    """Guided filter of `src` using `guide` (single eps)."""
    return guided_filter_multi_eps(guide, src, r, (eps,))[0]
