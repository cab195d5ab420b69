"""Pallas TPU kernel: clamped box SUM (radius 4) on the packed 2x2 layout.

Why: the guided filter's box sums are the fusion branch's top cost. Every
exact XLA formulation measured on v5e at (16,240,320,128) bf16
(scripts/bench_boxfilter_packed.py):
    band-matmul einsum 10.3 ms | separable packed conv 8.6 ms |
    depthwise packed conv 27 ms | in-layout shift-add 16 ms |
    unpack/shift/pack 43 ms
All matmul forms burn >=14x dead MXU FLOPs (contraction >=128 for 9 useful
taps); all shift-add forms lower to unfused one-slice-per-pass loops. The
data itself is only 2x(157 MB read + 157 MB write) = ~0.8 ms of HBM traffic:
this kernel gets there by keeping each (H- or W-) pass inside VMEM.

Design:
  * Two separable passes. The H-pass grids over (batch, W-tiles) so the full
    H' extent sits in VMEM and row shifts are internal; the W-pass grids
    over (batch, H-tiles) likewise. No cross-program halo.
  * Packed phases: original H index = 2*i + pi with pi*2+pj the low bits of
    the lane (channel = c*4 + pi*2 + pj). The 9-tap window decomposes into
    block shifts d in [-2,2]: d in {-1,0,1} feed BOTH phases; d=-2 misses
    (P=1 <- p=0); d=+2 misses (P=0 <- p=1). Phase sums are masked XOR lane
    rolls (XOR 2 for pi in the H-pass, XOR 1 for pj in the W-pass) — pure
    VPU, zero MXU FLOPs.
  * f32 VMEM scratch with zeroed 2-row halos; shifted reads slice the
    scratch ref (f32 — bf16 sublane-offset slices miscompile, see
    docs/MOSAIC.md).
  * VJP: the clamped box operator is symmetric (band matrix B = B^T, and
    (Bh ∘ Bw)^T = Bw ∘ Bh = same op), so the backward pass IS the kernel.

Even radii r = 2m generalize the r=4 structure (2m-1 both-phase central
block shifts + one single-phase edge tap per side): r=4 is the reference's
Cell_Decom radius (model_fusion_auto.py:500); r=2 serves the subsample-2
fast guided filter (ops/guided_filter.py). Other radii fall back to the
matmul path in ops/packed.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4  # window 9 on the original grid; block shifts -2..2 on the packed grid
SUPPORTED_R = (2, 4)  # even radii: m = r//2 block halo, same tap structure


def pallas_box_enabled() -> bool:
    """On by default on TPU; PAIF_PALLAS_BOX=0 reverts to the matmul path."""
    env = os.environ.get("PAIF_PALLAS_BOX")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _xor_roll(v: jnp.ndarray, xor_bit: int) -> jnp.ndarray:
    """v[..., l] -> v[..., l XOR xor_bit] along the minor (lane) axis.

    pltpu.roll is circular with non-negative shifts; the wrapped lanes are
    never selected (a lane with the low phase bit clear is never within
    xor_bit of the top, and vice versa), so two masked rolls compose the
    XOR permutation exactly.
    """
    n = v.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    low = (lane & xor_bit) == 0
    fwd = pltpu.roll(v, n - xor_bit, axis=v.ndim - 1)  # out[l] = v[l + xor_bit]
    bwd = pltpu.roll(v, xor_bit, axis=v.ndim - 1)  # out[l] = v[l - xor_bit]
    return jnp.where(low, fwd, bwd)


def _combine(mid, lo, hi, xor_bit):
    """Tap/phase combination shared by both passes (see module docstring).

    out = mid + lo + hi + xor(mid) + [low? xor(lo) : xor(hi)]. The masked
    tail folds into ONE xor: with u = where(low, hi, lo) at SOURCE lanes,
    xor(u)[l] = low(l) ? lo[l^b] : hi[l^b] (the phase mask complements
    under xor) — so a single where + one xor replaces two of each.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, mid.shape, mid.ndim - 1)
    low_phase = (lane & xor_bit) == 0
    u = mid + jnp.where(low_phase, hi, lo)
    return mid + lo + hi + _xor_roll(u, xor_bit)


def _axis_idx(axis: int, start, stop):
    idx = [slice(None)] * 3
    idx[axis - 1] = slice(start, stop)
    return tuple(idx)


def _zero_halos(s_ref, *, axis: int, m: int, n: int):
    """Zero the m halo rows on each side of the pass axis of the scratch.

    The body fill only writes [m, n+m), so across a multi-tensor kernel the
    halos stay zero after one clearing."""
    z2 = list(s_ref.shape)
    z2[axis - 1] = m
    zeros = jnp.zeros(z2, jnp.float32)
    s_ref[_axis_idx(axis, 0, m)] = zeros
    s_ref[_axis_idx(axis, n + m, n + 2 * m)] = zeros


def _box_into(src_f32, o_ref, s_ref, *, axis: int, xor_bit: int, m: int, n: int):
    """Fill the scratch body with src_f32 and write one combined box pass.

    Halos of s_ref must already be zero (see _zero_halos). Tap structure
    for even radius r = 2m: the 2m-1 central block shifts feed BOTH phases
    (mid), the extreme shifts -m/+m miss one phase each (lo/hi with the
    masked xor in _combine)."""
    s_ref[_axis_idx(axis, m, n + m)] = src_f32

    def sl(start, stop):
        return s_ref[_axis_idx(axis, start, stop)]

    mid = sl(1, n + 1)
    for d in range(2, 2 * m):
        mid = mid + sl(d, n + d)
    o_ref[0] = _combine(mid, sl(0, n), sl(2 * m, n + 2 * m), xor_bit).astype(o_ref.dtype)


def _pass_kernel(x_ref, o_ref, s_ref, *, axis: int, xor_bit: int, m: int):
    """One separable box pass over the full `axis` extent of the block.

    x_ref/o_ref: (1, A, B, C4) with the pass axis at position `axis` (1 or
    2); s_ref: f32 scratch with m (= r//2 block) halo rows on each side of
    that axis.
    """
    n = x_ref.shape[axis]
    _zero_halos(s_ref, axis=axis, m=m, n=n)
    _box_into(x_ref[0].astype(jnp.float32), o_ref, s_ref, axis=axis, xor_bit=xor_bit, m=m, n=n)


def _multi_pass_kernel(
    *refs, axis: int, xor_bit: int, m: int, k: int, prod: bool, n_scratch: int = 1,
    n_gates: int = 0,
):
    """Fused multi-tensor box pass through 1..n_out f32 scratches.

    refs = k input refs, [+ 1 gate ref when prod / + n_gates gate refs],
    then the output refs, then n_scratch scratch refs. Modes:
      * prod=True: each input x emits (box(x), box(x*g)) with the product
        computed IN VMEM — the guided filter's stage-A correlation moment
        never materializes x*g in HBM.
      * n_gates>0 (exclusive with prod): each input x emits box(x * g_j)
        for EVERY gate, products in VMEM — the analytic GF backward's
        cotangent pre-products (ybar*guide*inv_n, ybar*inv_n) never hit
        HBM (at B16 flagship each is a 315 MB src-width temp).

    Scratch modes (PAIF_FUSED_GF_SCRATCH): one shared scratch reused
    sequentially keeps VMEM ~independent of k but serializes the streams
    (WAR hazard: stream t+1's fill waits on stream t's reads); per-output
    scratches ('per') cost n_out slabs and let the compiler overlap one
    stream's fill (VPU copy/cast) with another's combine (rolls + adds).
    """
    n_g = (1 if prod else 0) + n_gates
    n_in = k + n_g
    xs = refs[:k]
    g_refs = refs[k : k + n_g]
    n_out = k * (2 if prod else max(1, n_gates))
    outs = refs[n_in : n_in + n_out]
    s_refs = refs[n_in + n_out :]
    n = xs[0].shape[axis]
    for s_ref in s_refs:
        _zero_halos(s_ref, axis=axis, m=m, n=n)
    kw = dict(axis=axis, xor_bit=xor_bit, m=m, n=n)

    def scratch(j):
        return s_refs[j % len(s_refs)]

    for t in range(k):
        x = xs[t][0].astype(jnp.float32)
        if prod:
            _box_into(x, outs[2 * t], scratch(2 * t), **kw)
            _box_into(
                x * g_refs[0][0].astype(jnp.float32), outs[2 * t + 1], scratch(2 * t + 1), **kw
            )
        elif n_gates:
            for j in range(n_gates):
                o = t * n_gates + j
                _box_into(x * g_refs[j][0].astype(jnp.float32), outs[o], scratch(o), **kw)
        else:
            _box_into(x, outs[t], scratch(t), **kw)


def _pick_tile(total: int, bytes_per_col: int) -> int:
    """Largest 8-aligned divisor of `total` whose f32 column-slab fits VMEM.

    The budget is per VALUE, not per kernel: besides the scratch, Mosaic
    keeps ~6 live f32 temporaries of the same shape (mid/lo/hi + rolls +
    accumulator), so ~8x the budget of VMEM is actually in play. Two-stage:
    prefer the conservative 1 MB budget (~8 MB in play) and only relax to
    1.5 MB (~12 of the ~16 MB VMEM — validated on-chip at the flagship
    shapes) when nothing fits at 1 MB. (Round-3 regression fix: the
    8-align constraint plus a flat 1 MB budget silently disqualified the
    flagship W-pass — 240 rows need tile 8 at 1.33 MB — so the kernel fell
    back to einsum at exactly the shapes it was built for.)
    """
    for budget in (1024 * 1024, 1536 * 1024):
        for t in range(total, 0, -1):
            # the tile lands in a block's sublane slot: keep it 8-aligned
            if total % t == 0 and t % 8 == 0 and t * bytes_per_col <= budget:
                return t
    return 0  # nothing fits: caller must fall back to the matmul path


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _box_vjp(r: int, xp: jnp.ndarray) -> jnp.ndarray:
    return _box_fwd_impl(xp, r)


def box_filter_packed_pallas(xp: jnp.ndarray, r: int = R) -> jnp.ndarray:
    return _box_vjp(r, xp)


def _box_fwd_impl(xp: jnp.ndarray, r: int = R) -> jnp.ndarray:
    b, hp, wp, c4 = xp.shape
    m = r // 2
    # H-pass: full H' per block, tiles over W'. The W-tiles make each block
    # a strided DMA, but the kernel is VPU-bound, not DMA-bound (a 3x-read
    # contiguous-halo variant measured 7.99 vs 6.69 ms — see git history).
    tw = _pick_tile(wp, (hp + 2 * m) * c4 * 4)
    y = pl.pallas_call(
        functools.partial(_pass_kernel, axis=1, xor_bit=2, m=m),
        grid=(b, wp // tw),
        in_specs=[pl.BlockSpec((1, hp, tw, c4), lambda i, j: (i, 0, j, 0))],
        out_specs=pl.BlockSpec((1, hp, tw, c4), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM((hp + 2 * m, tw, c4), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xp)
    # W-pass: full W' per block (already contiguous), tiles over H'.
    th2 = _pick_tile(hp, (wp + 2 * m) * c4 * 4)
    return pl.pallas_call(
        functools.partial(_pass_kernel, axis=2, xor_bit=1, m=m),
        grid=(b, hp // th2),
        in_specs=[pl.BlockSpec((1, th2, wp, c4), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, th2, wp, c4), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[pltpu.VMEM((th2, wp + 2 * m, c4), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(y)


def _box_fwd(r, xp):
    return _box_fwd_impl(xp, r), None


def _box_bwd(r, _res, g):
    # The operator is symmetric: B^T = B per axis, (Bh∘Bw)^T = Bw∘Bh = Bh∘Bw.
    return (_box_fwd_impl(g, r),)


_box_vjp.defvjp(_box_fwd, _box_bwd)


# ---------------------------------------------------------------------------
# Fused multi-tensor boxes (round 3): the guided filter's 6 src-width box
# sums grouped into shared-launch kernels, with the stage-A product
# (guide*src) computed in VMEM. Gated by PAIF_FUSED_GF_BOX (see
# fused_gf_box_enabled) so the e2e effect is A/B-measurable on chip.
# ---------------------------------------------------------------------------


def fused_gf_box_enabled() -> bool:
    """PAIF_FUSED_GF_BOX gate for the fused guided-filter box path.

    Default ON since the round-4 on-chip A/B (scripts/bench_gf_fused.py,
    2026-08-19, v5e): isolated two-eps GF 20.4 (fused K=4) vs 23.2 ms
    (single-tensor Pallas) vs 30.8 (einsum); fusion-branch forward B16
    119.1 vs 122.2 ms. No VMEM overflow at flagship shapes; composes with
    pallas_box_enabled() so non-TPU backends are unaffected."""
    env = os.environ.get("PAIF_FUSED_GF_BOX")
    if env is not None:
        return env not in ("0", "false", "off")
    return True


def _scratch_per_output() -> bool:
    """PAIF_FUSED_GF_SCRATCH=per: one scratch slab per output stream (ILP
    experiment — see _multi_pass_kernel); default: one shared slab."""
    return os.environ.get("PAIF_FUSED_GF_SCRATCH", "shared") == "per"


def _pick_tile_fused(
    total: int, extent: int, c4: int, m: int, n_io: int, io_bytes: int, n_scratch: int = 1
) -> int:
    """Largest 8-aligned divisor of `total` fitting the fused kernel's VMEM
    model: n_scratch f32 scratch slabs (extent+2m rows) + ~6 live f32
    temporaries of block size (the sequential per-tensor chain keeps the
    live set ~independent of k) + the double-buffered io blocks (which DO
    grow with k). Budgets are two-stage like _pick_tile: prefer headroom,
    relax once.
    """
    for budget in (12 * 2**20, 15 * 2**20):
        for t in range(total, 0, -1):
            if total % t or t % 8:
                continue
            scratch = n_scratch * (extent + 2 * m) * t * c4 * 4
            temps = 6 * extent * t * c4 * 4
            io = 2 * n_io * extent * t * c4 * io_bytes
            if scratch + temps + io <= budget:
                return t
    return 0


def _pass_tile(shape, r: int, axis: int, n_io: int, io_bytes: int, n_scratch: int = 1) -> int:
    b, hp, wp, c4 = shape
    m = r // 2
    if axis == 1:
        return _pick_tile_fused(wp, hp, c4, m, n_io, io_bytes, n_scratch)
    return _pick_tile_fused(hp, wp, c4, m, n_io, io_bytes, n_scratch)


def _n_scratch_for(n_out: int) -> int:
    return n_out if _scratch_per_output() else 1


def _fused_pass(xs, r: int, axis: int, prod: bool):
    """One fused separable pass over k tensors (+ optional gate as xs[-1])."""
    k = len(xs) - (1 if prod else 0)
    n_out = k * (2 if prod else 1)
    b, hp, wp, c4 = xs[0].shape
    m = r // 2
    io_bytes = max(x.dtype.itemsize for x in xs)
    n_scratch = _n_scratch_for(n_out)
    tile = _pass_tile(xs[0].shape, r, axis, len(xs) + n_out, io_bytes, n_scratch)
    if tile == 0 and n_scratch > 1:
        n_scratch = 1  # per-output scratches don't fit: shared slab
        tile = _pass_tile(xs[0].shape, r, axis, len(xs) + n_out, io_bytes, 1)
    if tile == 0:
        raise ValueError(
            f"fused box pass infeasible at shape {xs[0].shape} (axis {axis}, "
            f"{len(xs) + n_out} io refs) — gate callers on fused_boxes_applicable"
        )
    if axis == 1:
        block = (1, hp, tile, c4)
        index_map = lambda i, j: (i, 0, j, 0)  # noqa: E731
        grid = (b, wp // tile)
        scratch = pltpu.VMEM((hp + 2 * m, tile, c4), jnp.float32)
        xor_bit = 2
    else:
        block = (1, tile, wp, c4)
        index_map = lambda i, j: (i, j, 0, 0)  # noqa: E731
        grid = (b, hp // tile)
        scratch = pltpu.VMEM((tile, wp + 2 * m, c4), jnp.float32)
        xor_bit = 1
    spec = pl.BlockSpec(block, index_map)
    out_shape = [jax.ShapeDtypeStruct(xs[0].shape, xs[0].dtype)] * n_out
    return pl.pallas_call(
        functools.partial(
            _multi_pass_kernel,
            axis=axis,
            xor_bit=xor_bit,
            m=m,
            k=k,
            prod=prod,
            n_scratch=n_scratch,
        ),
        grid=grid,
        in_specs=[spec] * len(xs),
        out_specs=[spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=[scratch] * n_scratch,
        interpret=jax.default_backend() != "tpu",
    )(*xs)


def _fused_group_size() -> int:
    """Tensors per fused kernel call (PAIF_FUSED_GF_K). Default 4 since the
    round-4 on-chip A/B: K=4 20.36 vs K=2 20.72 ms isolated (and 119.1 vs
    119.3 ms fusion-forward B16) — the chunked dispatch still shrinks any
    pass whose K=4 slab would not fit VMEM."""
    return max(1, int(os.environ.get("PAIF_FUSED_GF_K", "4")))


def _chunked_pass(xs, r: int, axis: int):
    """One separable pass over all tensors, greedily grouped into the
    largest VMEM-feasible fused calls (<= PAIF_FUSED_GF_K). The two passes
    may legitimately land at different group sizes — the W-pass slab
    (full-W extent) is bigger than the H-pass one at flagship aspect
    ratios. k=1 chunks still run (same structure as the validated single
    kernel, one extra io ref pair of headroom)."""
    io_bytes = max(x.dtype.itemsize for x in xs)
    outs = []
    i = 0
    while i < len(xs):
        k = min(_fused_group_size(), len(xs) - i)
        while k > 1 and _pass_tile(xs[0].shape, r, axis, 2 * k, io_bytes) == 0:
            k -= 1
        outs.extend(_fused_pass(list(xs[i : i + k]), r, axis, prod=False))
        i += k
    return outs


def _multi_box_impl(xs, r: int):
    """Boxes of each tensor, fused into shared-launch calls per pass."""
    return tuple(_chunked_pass(_chunked_pass(xs, r, axis=1), r, axis=2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _multi_box_vjp(r: int, *xs):
    return _multi_box_impl(xs, r)


def _multi_box_fwd(r, *xs):
    return _multi_box_impl(xs, r), None


def _multi_box_bwd(r, _res, gs):
    # each box is symmetric (see _box_bwd): bwd = the same multi box
    return _multi_box_impl(tuple(gs), r)


_multi_box_vjp.defvjp(_multi_box_fwd, _multi_box_bwd)


def box_multi_packed_pallas(xs, r: int = R):
    """Clamped box sums of several same-shape packed tensors, fused into
    shared-launch Pallas pass pairs. Returns a tuple (same order)."""
    return _multi_box_vjp(r, *xs)


def _pair_prod_impl(x, g, r: int):
    """(box(x), box(x*g)) with the product computed in VMEM (H-pass), then
    one fused W-pass over both H-passed tensors. Falls back to single
    kernels + a materialized product when the prod pass does not fit."""
    if _pass_tile(x.shape, r, 1, 4, max(x.dtype.itemsize, g.dtype.itemsize)) == 0:
        return _box_fwd_impl(x, r), _box_fwd_impl((x * g).astype(x.dtype), r)
    hx, hxg = _fused_pass([x, g], r, axis=1, prod=True)
    return tuple(_chunked_pass([hx, hxg], r, axis=2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair_prod_vjp(r: int, x, g):
    return _pair_prod_impl(x, g, r)


def _pair_prod_fwd(r, x, g):
    return _pair_prod_impl(x, g, r), (x, g)


def _pair_prod_bwd(r, res, cts):
    # y0 = B x, y1 = B (x*g), B symmetric: dx = B c0 + g * B c1; dg = x * B c1
    x, g = res
    c0, c1 = cts
    b0, b1 = _multi_box_impl((c0, c1), r)
    return (b0 + g * b1).astype(x.dtype), (x * b1).astype(g.dtype)


_pair_prod_vjp.defvjp(_pair_prod_fwd, _pair_prod_bwd)


def box_pair_prod_packed_pallas(x, g, r: int = R):
    """Fused guided-filter stage-A moments: (box(x), box(x*g)) without ever
    materializing x*g in HBM (reference moment pair: guided_filter_pytorch
    GuidedFilter.forward mean_x / mean_xy)."""
    return _pair_prod_vjp(r, x, g)


def _gated_h_pass(xs, gates, r: int):
    """H-pass of box(x_t * g_j) for every (input, gate) pair, products in
    VMEM. Gates may be batch-1 (broadcast across the batch grid axis) or
    full-batch; outputs are x-major, gate-minor, at full batch."""
    k, n_g = len(xs), len(gates)
    n_out = k * n_g
    b, hp, wp, c4 = xs[0].shape
    m = r // 2
    io_bytes = max(t.dtype.itemsize for t in list(xs) + list(gates))
    n_scratch = _n_scratch_for(n_out)
    tile = _pass_tile(xs[0].shape, r, 1, k + n_g + n_out, io_bytes, n_scratch)
    if tile == 0 and n_scratch > 1:
        n_scratch = 1
        tile = _pass_tile(xs[0].shape, r, 1, k + n_g + n_out, io_bytes, 1)
    if tile == 0:
        raise ValueError(
            f"gated box pass infeasible at shape {xs[0].shape} "
            f"({k + n_g + n_out} io refs) — gate callers on _pass_tile"
        )
    block = (1, hp, tile, c4)
    x_spec = pl.BlockSpec(block, lambda i, j: (i, 0, j, 0))

    def gate_spec(g):
        if g.shape[0] == 1:
            return pl.BlockSpec(block, lambda i, j: (0, 0, j, 0))
        return x_spec

    return pl.pallas_call(
        functools.partial(
            _multi_pass_kernel,
            axis=1,
            xor_bit=2,
            m=m,
            k=k,
            prod=False,
            n_gates=n_g,
            n_scratch=n_scratch,
        ),
        grid=(b, wp // tile),
        in_specs=[x_spec] * k + [gate_spec(g) for g in gates],
        out_specs=[x_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct(xs[0].shape, xs[0].dtype)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((hp + 2 * m, tile, c4), jnp.float32)
        ] * n_scratch,
        interpret=jax.default_backend() != "tpu",
    )(*xs, *gates)


def _multi_prod_impl(xs, gates, r: int):
    """box(x_t * g_j) for every pair, x-major: the products are computed in
    the H-pass kernel's VMEM; the W-pass then runs as ordinary fused chunks
    over the H-passed tensors. Falls back to materialized products when the
    gated pass does not fit."""
    k, n_g = len(xs), len(gates)
    if _pass_tile(xs[0].shape, r, 1, k + n_g + k * n_g,
                  max(t.dtype.itemsize for t in list(xs) + list(gates))) == 0:
        prods = [(x * g).astype(x.dtype) for x in xs for g in gates]
        return _multi_box_impl(tuple(prods), r)
    hs = _gated_h_pass(xs, gates, r)
    return tuple(_chunked_pass(list(hs), r, axis=2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _multi_prod_vjp(r: int, k: int, *ops):
    return _multi_prod_impl(ops[:k], ops[k:], r)


def _multi_prod_fwd(r, k, *ops):
    return _multi_prod_impl(ops[:k], ops[k:], r), ops


def _multi_prod_bwd(r, k, res, cts):
    # y_{t,j} = B(x_t ∘ g_j), B symmetric: with c'_{t,j} = B(c_{t,j}),
    # dx_t = Σ_j g_j ∘ c'_{t,j}; dg_j = Σ_t x_t ∘ c'_{t,j} (batch-summed
    # for batch-1 gates).
    xs, gates = res[:k], res[k:]
    n_g = len(gates)
    bs = _multi_box_impl(tuple(cts), r)
    dxs = []
    for t, x in enumerate(xs):
        d = sum(gates[j] * bs[t * n_g + j] for j in range(n_g))
        dxs.append(d.astype(x.dtype))
    dgs = []
    for j, g in enumerate(gates):
        d = sum(xs[t] * bs[t * n_g + j] for t in range(len(xs)))
        if g.shape[0] == 1 and d.shape[0] != 1:
            d = d.sum(axis=0, keepdims=True)
        dgs.append(d.astype(g.dtype))
    return (*dxs, *dgs)


_multi_prod_vjp.defvjp(_multi_prod_fwd, _multi_prod_bwd)


def box_multi_prod_packed_pallas(xs, gates, r: int = R):
    """Clamped box sums of every input×gate product, x-major gate-minor,
    with the products computed in the H-pass kernel's VMEM — none of the
    k*len(gates) src-width product temps is ever materialized in HBM.
    Built for the analytic GF backward's cotangent pre-products
    (ops/guided_filter.py _gf_backward)."""
    return _multi_prod_vjp(r, len(xs), *xs, *gates)


def _stageb_kernel(*refs, axis: int, xor_bit: int, m: int, n_eps: int, n_scratch: int):
    """GF stage-B H-pass: per eps j, a_j = cov*k_j and b_j = mean_s -
    a_j*mean_g are formed IN VMEM and boxed — the (a, b) pairs never hit
    HBM. refs = (cov, mean_s, mean_g, k_1..k_E) + 2E outputs + scratches."""
    cov_ref, ms_ref, mg_ref = refs[:3]
    k_refs = refs[3 : 3 + n_eps]
    outs = refs[3 + n_eps : 3 + 3 * n_eps]
    s_refs = refs[3 + 3 * n_eps :]
    n = cov_ref.shape[axis]
    for s_ref in s_refs:
        _zero_halos(s_ref, axis=axis, m=m, n=n)
    kw = dict(axis=axis, xor_bit=xor_bit, m=m, n=n)

    def scratch(j):
        return s_refs[j % len(s_refs)]

    cov = cov_ref[0].astype(jnp.float32)
    ms = ms_ref[0].astype(jnp.float32)
    mg = mg_ref[0].astype(jnp.float32)
    for j in range(n_eps):
        a = cov * k_refs[j][0].astype(jnp.float32)
        _box_into(a, outs[2 * j], scratch(2 * j), **kw)
        _box_into(ms - a * mg, outs[2 * j + 1], scratch(2 * j + 1), **kw)


def box_gf_stageb_packed_pallas(cov, ms, mg, ks, r: int = R):
    """Boxed GF stage-B coefficients [box(a_1), box(b_1), ...] with the
    per-eps (a, b) construction fused into the H-pass kernel's VMEM
    (reference: guided_filter_pytorch GuidedFilter.forward mean_A/mean_b).
    NOT differentiable (no VJP): only reachable from _gf_forward, which is
    always under the guided filter's own custom VJP. Falls back to the
    materialized construction + fused multi-box when the slab won't fit."""
    n_eps = len(ks)
    b, hp, wp, c4 = cov.shape
    m = r // 2
    io_bytes = max(t.dtype.itemsize for t in (cov, ms, mg, *ks))
    n_io = 3 + 3 * n_eps
    n_scratch = _n_scratch_for(2 * n_eps)
    tile = _pass_tile(cov.shape, r, 1, n_io, io_bytes, n_scratch)
    if tile == 0 and n_scratch > 1:
        n_scratch = 1
        tile = _pass_tile(cov.shape, r, 1, n_io, io_bytes, 1)
    if tile == 0:
        a_bs = []
        for k in ks:
            a = cov * k
            a_bs.extend([a, (ms - a * mg).astype(cov.dtype)])
        return list(_multi_box_impl(tuple(a_bs), r))
    block = (1, hp, tile, c4)
    spec = pl.BlockSpec(block, lambda i, j: (i, 0, j, 0))
    hs = pl.pallas_call(
        functools.partial(
            _stageb_kernel, axis=1, xor_bit=2, m=m, n_eps=n_eps, n_scratch=n_scratch
        ),
        grid=(b, wp // tile),
        in_specs=[spec] * (3 + n_eps),
        out_specs=[spec] * (2 * n_eps),
        out_shape=[jax.ShapeDtypeStruct(cov.shape, cov.dtype)] * (2 * n_eps),
        scratch_shapes=[pltpu.VMEM((hp + 2 * m, tile, c4), jnp.float32)] * n_scratch,
        interpret=jax.default_backend() != "tpu",
    )(cov, ms, mg, *ks)
    return list(_chunked_pass(list(hs), r, axis=2))


def fused_boxes_applicable(xp_shape, r: int, ignore_env: bool = False) -> bool:
    """Shape/VMEM feasibility of the fused kernels at this tensor shape.

    Only the k=1 VMEM model must fit (2 io refs per pass) — the chunked
    dispatch shrinks group sizes per pass to whatever fits, and the prod
    pass has its own materialized-product fallback.

    ignore_env: skip the PAIF_FUSED_GF_BOX opt-in (used by the
    differentiated paths, whose own knob PAIF_PALLAS_BOX_DIFF is the
    opt-in there — the single-tensor-kernel-in-diff-graph config is a
    known measured regression and is deliberately unreachable).
    PAIF_PALLAS_BOX=0 stays a global kill switch either way.
    """
    b, hp, wp, c4 = xp_shape
    return (
        r in SUPPORTED_R
        and c4 % 128 == 0
        and hp % 8 == 0
        and wp % 8 == 0
        and hp > 2 * r
        and wp > 2 * r
        and _pass_tile(xp_shape, r, 1, 2, 4) > 0
        and _pass_tile(xp_shape, r, 2, 2, 4) > 0
        and pallas_box_enabled()
        and (ignore_env or fused_gf_box_enabled())
    )


def pallas_box_applicable(xp_shape, r: int) -> bool:
    b, hp, wp, c4 = xp_shape
    return (
        r in SUPPORTED_R
        and c4 % 128 == 0
        and hp % 8 == 0
        and wp % 8 == 0
        and hp > 2 * r
        and wp > 2 * r
        # both passes must have a VMEM-feasible 8-aligned tile (very large
        # resolutions fall back to the matmul path instead of overflowing)
        and _pick_tile(wp, (hp + 2 * (r // 2)) * c4 * 4) > 0
        and _pick_tile(hp, (wp + 2 * (r // 2)) * c4 * 4) > 0
        and pallas_box_enabled()
    )
