"""Packed (2x2 space-to-depth) layout: exact equivalence with plain NHWC.

The packed conv computes the same tap sums as the plain conv with a
scattered kernel, so results must match to f32 summation-order tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paif_tpu.nn.layers import get_precision
from paif_tpu.ops.guided_filter import box_filter
from paif_tpu.ops.packed import (
    box_filter_packed,
    channel_reduce_packed,
    conv_same_packed,
    pack,
    pack_kernel,
    tile_gate_packed,
    unpack,
)


def _conv_same(x, w, dilation=1, groups=1):
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        w,
        (1, 1),
        [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=get_precision(),
    )


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    assert jnp.array_equal(unpack(pack(x)), x)


def test_pack_concat_commutes():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(1, 6, 6, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 6, 6, 2)), jnp.float32)
    lhs = pack(jnp.concatenate([a, b], -1))
    rhs = jnp.concatenate([pack(a), pack(b)], -1)
    assert jnp.array_equal(lhs, rhs)


@pytest.mark.parametrize(
    "k,dilation,ci,co",
    [(1, 1, 4, 8), (3, 1, 32, 32), (3, 2, 32, 32), (5, 1, 4, 1), (7, 1, 32, 32), (7, 2, 8, 8)],
)
def test_packed_conv_matches_plain(k, dilation, ci, co):
    rng = np.random.default_rng(k * 10 + dilation)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, ci, co)) * 0.1, jnp.float32)
    ref = _conv_same(x, w, dilation)
    got = unpack(conv_same_packed(pack(x), w, dilation))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,dilation", [(3, 1), (3, 2), (7, 1)])
def test_packed_depthwise_matches_plain(k, dilation):
    rng = np.random.default_rng(42)
    c = 16
    x = jnp.asarray(rng.normal(size=(2, 12, 12, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, 1, c)) * 0.1, jnp.float32)
    ref = _conv_same(x, w, dilation, groups=c)
    got = unpack(conv_same_packed(pack(x), w, dilation, groups=c))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("groups,co", [(16, 16), (4, 8)])
def test_packed_grouped_dense_matches_grouped(monkeypatch, groups, co):
    """PAIF_PACKED_DW_DENSE (default ON) embeds grouped kernels into a
    block-diagonal dense one: XLA:TPU lowers feature_group_count>1 on the
    packed layout to a batch-minor 5-D form with 8x padding (round-4 OOM).
    Both routes must compute the same conv."""
    rng = np.random.default_rng(7)
    ci = 16
    x = jnp.asarray(rng.normal(size=(2, 12, 12, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, ci // groups, co)) * 0.1, jnp.float32)
    monkeypatch.setenv("PAIF_PACKED_DW_DENSE", "0")
    ref = conv_same_packed(pack(x), w, 2, groups=groups)
    monkeypatch.setenv("PAIF_PACKED_DW_DENSE", "1")
    got = conv_same_packed(pack(x), w, 2, groups=groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pack_kernel_extents():
    # packed spatial extent: k=3 -> 3, k=5 -> 3, k=7 -> 5 (d=1)
    for k, expect in [(3, 3), (5, 3), (7, 5)]:
        wp, (rh, rw) = pack_kernel(jnp.ones((k, k, 1, 1)), 1)
        assert wp.shape[0] == expect == 2 * rh + 1
    # non-square kernels pad per axis: (9,1) -> (5,1), pads (2,0)
    wp, (rh, rw) = pack_kernel(jnp.ones((9, 1, 1, 1)), 1)
    assert wp.shape[:2] == (5, 1) and (rh, rw) == (2, 0)


def test_packed_conv_non_square():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 12, 16, 8)), jnp.float32)
    for shape in [(9, 1), (1, 9), (3, 5)]:
        w = jnp.asarray(rng.normal(size=(*shape, 8, 4)) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1),
            [((shape[0] - 1) // 2,) * 2, ((shape[1] - 1) // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=get_precision(),
        )
        got = unpack(conv_same_packed(pack(x), w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_box_filter_packed_matches_plain():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 8)), jnp.float32)
    for r in (1, 4):
        ref = box_filter(x, r)
        got = unpack(box_filter_packed(pack(x), r))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_channel_reduce_and_tile():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 6)), jnp.float32)
    xp = pack(x)
    red = channel_reduce_packed(xp, jnp.max)
    assert jnp.array_equal(unpack(red), jnp.max(x, -1, keepdims=True))
    gate = channel_reduce_packed(xp, jnp.mean)
    tiled = tile_gate_packed(gate, 6)
    assert jnp.array_equal(unpack(tiled), jnp.broadcast_to(jnp.mean(x, -1, keepdims=True), x.shape))


def test_fusion_net_packed_matches_plain(monkeypatch):
    """Full FusionNetSearched: packed layout == plain layout (f32)."""
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched

    rng = np.random.default_rng(7)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)), jnp.float32)
    model = FusionNetSearched(32, PAIF_GENOTYPE)
    variables = model.init(jax.random.PRNGKey(0), ir, vis)

    monkeypatch.setenv("PAIF_PACKED", "0")
    plain = model.apply(variables, ir, vis)
    monkeypatch.setenv("PAIF_PACKED", "1")
    packed = model.apply(variables, ir, vis)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), rtol=2e-5, atol=2e-5)

    # gradients (the PGD path) must agree too
    monkeypatch.setenv("PAIF_PACKED", "0")
    gp = jax.grad(lambda t: jnp.sum(jnp.square(model.apply(variables, t, vis))))(ir)
    monkeypatch.setenv("PAIF_PACKED", "1")
    gq = jax.grad(lambda t: jnp.sum(jnp.square(model.apply(variables, t, vis))))(ir)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gp), rtol=2e-4, atol=2e-5)


def test_fusion_net_packed_odd_shape_fallback(monkeypatch):
    """Odd spatial dims silently fall back to the plain layout."""
    from paif_tpu.models import FusionNetSearched

    monkeypatch.setenv("PAIF_PACKED", "1")
    rng = np.random.default_rng(8)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 31, 33, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, 31, 33, 1)), jnp.float32)
    model = FusionNetSearched(32)
    variables = model.init(jax.random.PRNGKey(0), ir, vis)
    out = model.apply(variables, ir, vis)
    assert out.shape == (1, 31, 33, 1) and bool(jnp.all(jnp.isfinite(out)))


def test_guided_filter_analytic_vjp(monkeypatch):
    """The guided filter's analytic custom VJP == autodiff of the raw
    forward, in both layouts (guards the 6-box backward derivation)."""
    from paif_tpu.ops.guided_filter import _gf_forward, guided_filter_multi_eps
    from paif_tpu.ops.packed import packed_mode

    rng = np.random.default_rng(11)
    eps_list = (1e-3, 1e-4)
    for packed in (False, True):
        if packed:
            guide = jnp.asarray(rng.uniform(0, 1, (2, 10, 12, 4)), jnp.float32)
            src = jnp.asarray(rng.uniform(0, 1, (2, 10, 12, 4 * 6)), jnp.float32)
        else:
            guide = jnp.asarray(rng.uniform(0, 1, (2, 20, 24, 1)), jnp.float32)
            src = jnp.asarray(rng.uniform(0, 1, (2, 20, 24, 6)), jnp.float32)
        cot = [jnp.asarray(rng.normal(size=src.shape), jnp.float32) for _ in eps_list]

        def loss_custom(g, s):
            with packed_mode(packed):
                outs = guided_filter_multi_eps(g, s, 4, eps_list)
            return sum(jnp.sum(o * c) for o, c in zip(outs, cot))

        def loss_raw(g, s):
            outs = _gf_forward(packed, 4, eps_list, g, s)[0]
            return sum(jnp.sum(o * c) for o, c in zip(outs, cot))

        gc = jax.grad(loss_custom, argnums=(0, 1))(guide, src)
        gr = jax.grad(loss_raw, argnums=(0, 1))(guide, src)
        for a, b in zip(gc, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"packed={packed}",
            )


def test_fusion_net_nested_packed_context(monkeypatch):
    """FusionNetSearched embedded in a caller's packed context consumes
    packed inputs and returns packed output, equal to the plain result."""
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched
    from paif_tpu.ops.packed import pack, packed_mode, unpack

    monkeypatch.setenv("PAIF_PACKED", "1")
    rng = np.random.default_rng(12)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)), jnp.float32)
    model = FusionNetSearched(32, PAIF_GENOTYPE)
    variables = model.init(jax.random.PRNGKey(0), ir, vis)
    plain = model.apply(variables, ir, vis)

    with packed_mode(True):
        nested = model.apply(variables, pack(ir), pack(vis))
    np.testing.assert_allclose(
        np.asarray(unpack(nested)), np.asarray(plain), rtol=2e-5, atol=2e-5
    )


def test_fast_guided_filter(monkeypatch):
    """He's subsample-2 fast guided filter (PAIF_FAST_GF, opt-in): exact on
    constant images, close to the exact filter on smooth data, gradients
    finite, and r=2 Pallas boxes exact vs the plain box."""
    import importlib

    gf = importlib.import_module("paif_tpu.ops.guided_filter")
    from paif_tpu.ops.packed import pack, packed_mode, unpack

    rng = np.random.default_rng(3)
    # smooth image: repeated-upsample of a tiny random field
    base = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    x = jnp.asarray(np.repeat(np.repeat(base, 8, 1), 8, 2))
    g = jnp.max(x, -1, keepdims=True) - jnp.min(x, -1, keepdims=True)
    exact = gf.guided_filter_multi_eps(g, x, 4, (1e-3,))[0]
    for mode in ("1", "2"):
        monkeypatch.setenv("PAIF_FAST_GF", mode)
        with packed_mode(True):
            fast = unpack(gf.guided_filter_multi_eps(pack(g), pack(x), 4, (1e-3,))[0])
        rms = float(jnp.sqrt(jnp.mean((exact - fast) ** 2))) / (
            float(jnp.std(exact)) + 1e-9
        )
        assert rms < 0.15, (mode, rms)

        # constant image preserved
        xc = jnp.full((1, 16, 16, 8), 0.7)
        gc = jnp.zeros((1, 16, 16, 1))
        with packed_mode(True):
            outc = unpack(gf.guided_filter_multi_eps(pack(gc), pack(xc), 4, (1e-3,))[0])
        np.testing.assert_allclose(np.asarray(outc), 0.7, atol=1e-5)

        with packed_mode(True):
            grad = jax.grad(
                lambda a: jnp.sum(gf.guided_filter_multi_eps(pack(g), a, 4, (1e-3,))[0] ** 2)
            )(pack(x))
        assert bool(jnp.all(jnp.isfinite(grad)))


def test_pallas_box_r2_matches_plain(monkeypatch):
    from paif_tpu.ops.guided_filter import box_filter
    from paif_tpu.ops.packed import pack, unpack
    from paif_tpu.ops.pallas.box_filter import box_filter_packed_pallas, pallas_box_applicable

    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 32)), jnp.float32)
    xp = pack(x)
    assert pallas_box_applicable(xp.shape, 2)
    got = unpack(box_filter_packed_pallas(xp, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(box_filter(x, 2)), atol=1e-4)


def test_fused_multi_box_matches_einsum(monkeypatch):
    """Round-3 fused multi-tensor Pallas boxes (shared-launch pass pairs)
    == per-tensor einsum band matmuls, odd group tail included."""
    from paif_tpu.ops.pallas.box_filter import (
        box_multi_packed_pallas,
        fused_boxes_applicable,
    )

    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    monkeypatch.setenv("PAIF_FUSED_GF_BOX", "1")
    monkeypatch.setenv("PAIF_FUSED_GF_K", "4")  # chunks shrink per pass to fit VMEM
    monkeypatch.setenv("PAIF_FUSED_GF_SCRATCH", "per")  # ILP scratch mode
    rng = np.random.default_rng(21)
    for r in (2, 4):
        xs = [
            jnp.asarray(rng.normal(size=(2, 32, 48, 32)), jnp.float32) for _ in range(3)
        ]
        xps = [pack(x) for x in xs]
        assert fused_boxes_applicable(xps[0].shape, r)
        got = box_multi_packed_pallas(xps, r)
        assert len(got) == 3
        for g, x in zip(got, xs):
            np.testing.assert_allclose(
                np.asarray(unpack(g)), np.asarray(box_filter(x, r)), rtol=1e-4, atol=1e-4
            )


def test_fused_pair_prod_box_matches_einsum(monkeypatch):
    """Stage-A fusion: (box(x), box(x*g)) with the product computed in VMEM
    — values and gradients vs the einsum formulation."""
    from paif_tpu.ops.pallas.box_filter import box_pair_prod_packed_pallas

    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    monkeypatch.setenv("PAIF_FUSED_GF_BOX", "1")
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 32)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 32, 48, 32)), jnp.float32)
    xp, gp = pack(x), pack(g)
    s_x, s_xg = box_pair_prod_packed_pallas(xp, gp, 4)
    np.testing.assert_allclose(
        np.asarray(unpack(s_x)), np.asarray(box_filter(x, 4)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(unpack(s_xg)), np.asarray(box_filter(x * g, 4)), rtol=1e-4, atol=1e-4
    )

    def loss_fused(a, b):
        y0, y1 = box_pair_prod_packed_pallas(a, b, 4)
        return jnp.sum(y0 * y1)

    def loss_ref(a, b):
        y0 = box_filter_packed(a, 4, allow_pallas=False)
        y1 = box_filter_packed(a * b, 4, allow_pallas=False)
        return jnp.sum(y0 * y1)

    gf_ = jax.grad(loss_fused, argnums=(0, 1))(xp, gp)
    gr = jax.grad(loss_ref, argnums=(0, 1))(xp, gp)
    for a, b in zip(gf_, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2)


def test_multi_prod_box_matches_einsum(monkeypatch):
    """box(x_t * g_j) for every input×gate pair with products in VMEM —
    values (incl. a batch-1 broadcast gate) and gradients vs the einsum
    formulation (the GF backward's pre-product pattern)."""
    from paif_tpu.ops.pallas.box_filter import box_multi_prod_packed_pallas

    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    rng = np.random.default_rng(23)
    xs = [jnp.asarray(rng.normal(size=(2, 32, 48, 32)), jnp.float32) for _ in range(2)]
    g0 = jnp.asarray(rng.normal(size=(2, 32, 48, 32)), jnp.float32)
    g1 = jnp.asarray(rng.normal(size=(1, 32, 48, 32)), jnp.float32)  # batch-1 gate
    xps = [pack(x) for x in xs]
    gps = [pack(g0), pack(g1)]
    got = box_multi_prod_packed_pallas(xps, gps, 4)
    assert len(got) == 4
    for t, x in enumerate(xs):
        for j, g in enumerate((g0, g1)):
            np.testing.assert_allclose(
                np.asarray(unpack(got[2 * t + j])),
                np.asarray(box_filter(x * g, 4)),
                rtol=1e-4,
                atol=1e-4,
            )

    def loss_fused(a, b, c, d):
        ys = box_multi_prod_packed_pallas([a, b], [c, d], 4)
        return sum(jnp.sum(y * (i + 1)) for i, y in enumerate(ys))

    def loss_ref(a, b, c, d):
        ys = [box_filter_packed((x * g).astype(x.dtype), 4, allow_pallas=False)
              for x in (a, b) for g in (c, d)]
        return sum(jnp.sum(y * (i + 1)) for i, y in enumerate(ys))

    gf_ = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*xps, *gps)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*xps, *gps)
    for a, b in zip(gf_, gr):
        assert a.shape == b.shape  # batch-1 gate grad stays batch-1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2)


def test_guided_filter_fused_boxes_match(monkeypatch):
    """guided_filter_multi_eps primal with the fused Pallas boxes ==
    the einsum-only path (f32), including the Cell_Decom two-eps config."""
    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import packed_mode

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 48, 32)), jnp.float32)
    g = jnp.max(x, -1, keepdims=True) - jnp.min(x, -1, keepdims=True)
    xp, gp = pack(x), pack(g)

    monkeypatch.setenv("PAIF_PALLAS_BOX", "0")
    with packed_mode(True):
        want = guided_filter_multi_eps(gp, xp, 4, (1e-3, 1e-4))
    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    monkeypatch.setenv("PAIF_FUSED_GF_BOX", "1")
    with packed_mode(True):
        got = guided_filter_multi_eps(gp, xp, 4, (1e-3, 1e-4))
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_guided_filter_diff_knob_fused_bwd(monkeypatch):
    """PAIF_PALLAS_BOX_DIFF: the differentiated guided-filter paths routed
    through the fused Pallas kernels == the einsum analytic VJP."""
    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import packed_mode

    rng = np.random.default_rng(31)
    eps_list = (1e-3, 1e-4)
    guide = jnp.asarray(rng.uniform(0, 1, (2, 16, 24, 4)), jnp.float32)
    src = jnp.asarray(rng.uniform(0, 1, (2, 16, 24, 128)), jnp.float32)
    cot = [jnp.asarray(rng.normal(size=src.shape), jnp.float32) for _ in eps_list]

    def loss(g, s):
        with packed_mode(True):
            outs = guided_filter_multi_eps(g, s, 4, eps_list)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cot))

    monkeypatch.setenv("PAIF_PALLAS_BOX_DIFF", "0")
    want = jax.grad(loss, argnums=(0, 1))(guide, src)
    # the diff knob alone must select the FUSED kernels (PAIF_FUSED_GF_BOX
    # gates only the primal path; single-kernel-in-diff is unreachable)
    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    monkeypatch.setenv("PAIF_PALLAS_BOX_DIFF", "1")
    got = jax.grad(loss, argnums=(0, 1))(guide, src)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3)


def test_box_applicability_at_flagship_shapes(monkeypatch):
    """Guard against the round-3 regression class: the Pallas/fused paths
    silently disqualifying themselves at exactly the flagship shapes
    ((16,240,320,128) packed src, r=4). Pure shape/VMEM math — no compute."""
    from paif_tpu.ops.pallas.box_filter import (
        _pass_tile,
        fused_boxes_applicable,
        pallas_box_applicable,
    )

    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    monkeypatch.setenv("PAIF_FUSED_GF_BOX", "1")
    shape = (16, 240, 320, 128)
    assert pallas_box_applicable(shape, 4)
    assert fused_boxes_applicable(shape, 4)
    # the stage-A prod pass (4 io refs, bf16) must fit fused on the H axis
    assert _pass_tile(shape, 4, 1, 4, 2) > 0
    # and the W-pass must still fit PAIRS (the design group size) in bf16
    assert _pass_tile(shape, 4, 2, 4, 2) > 0
    # r=2 (fast-GF case) at the quarter-res shape
    assert pallas_box_applicable((16, 120, 160, 128), 2)
