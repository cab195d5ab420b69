"""Pipeline parallelism (GPipe-style) for the joint model over a `pp` mesh
axis: stage 0 = fusion branch + normalize chain, stage 1 = SegFormer.
Forward schedules (shard_map and multi-jit) plus a TRAINING schedule with
the GPipe backward (make_pp_train_step, round 5).

TPU-native expression: `shard_map` over the mesh gives per-device SPMD
code; the stage handoff is ONE `lax.ppermute` of the stage-0 activation
per microbatch tick, riding ICI. Each device takes its stage's branch of a
`lax.cond` on its `pp` axis index (no collectives inside the branches, so
divergent control flow is deadlock-free), and a `lax.scan` runs the
M+1-tick schedule: tick t runs stage 0 on microbatch t and stage 1 on
microbatch t-1, so the two stages overlap in steady state.

Scope: inference/eval forward (train=False). Parameters are REPLICATED
across `pp` — at 45M params the motivation for PP here is activation
memory and stage overlap, not parameter sharding; a user scaling the
backbone would shard `variables` over `pp` by stage in `in_specs`. Composes
with data parallelism: batch dims shard over the `data` axis as usual.

This mirrors how the reference would be deployed across accelerators if it
had any multi-device story (it has none — `robust_test.py` runs batch 1 on
one device); see parallel/mesh.py (DP) and parallel/tp.py (TP) for the
other modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_pp_forward(model, mesh: Mesh, microbatches: int, data_axis="data", pp_axis="pp"):
    """Returns fn(variables, ir, vis) -> (fused, seg) pipelined over 2 stages.

    The global batch must be divisible by (data-axis size) * microbatches.
    Output values equal the single-device forward (same math per
    microbatch; per-image normalization keeps microbatching exact).

    Does NOT compose with tensor parallelism: GSPMD lowers model-axis
    reshardings as full-mesh collective-permutes, and the `lax.cond` stage
    divergence below means half the devices never reach them (measured
    rendezvous deadlock on an 8-device mesh). For DP x TP x PP use
    `make_pp_forward_multijit`, which gives each stage its own submesh and
    keeps collectives out of divergent control flow.
    """
    n_pp = mesh.shape[pp_axis]
    if n_pp != 2:
        raise ValueError(f"2-stage pipeline needs a pp axis of size 2, got {n_pp}")
    m = microbatches

    def stage0(v, ir_mb, vis_mb):
        fused = model.apply(v, ir_mb, vis_mb, method=lambda mm, i, s: mm.fuse(i, s))
        x_seg = model.apply(v, fused, vis_mb, method=lambda mm, f, s: mm.seg_input(f, s))
        return x_seg, fused

    def stage1(v, x_seg):
        return model.apply(v, x_seg, method=lambda mm, x: mm.denoise_net(x))

    def fwd(v, ir, vis):
        # per-device views: ir/vis (m*mb, H, W, C); both pp members hold the
        # same data shard (in_specs replicate over pp)
        mb = ir.shape[0] // m
        b, h, w, _ = ir.shape
        stage = lax.axis_index(pp_axis)
        # probe shapes (trace-time only, no FLOPs at runtime: both branches
        # of the cond need matching output shapes)
        seg_shape = jax.eval_shape(
            lambda v_, x_: stage1(v_, x_), v, jnp.zeros((mb, h, w, 3), ir.dtype)
        )

        def tick(carry, t):
            act_prev = carry  # stage-0 payload from tick t-1, already permuted here

            def run0(_):
                i0 = jnp.minimum(t, m - 1) * mb  # t == m: dead tick, clamp
                ir_mb = lax.dynamic_slice_in_dim(ir, i0, mb)
                vis_mb = lax.dynamic_slice_in_dim(vis, i0, mb)
                x_seg, fused = stage0(v, ir_mb, vis_mb)
                payload = jnp.concatenate([x_seg, fused[..., :1]], axis=-1)
                return payload, jnp.zeros(seg_shape.shape, seg_shape.dtype)

            def run1(_):
                seg = stage1(v, act_prev[..., :3])
                return jnp.zeros_like(act_prev), seg

            payload, seg = lax.cond(stage == 0, run0, run1, operand=None)
            act_next = lax.ppermute(payload, pp_axis, perm=[(0, 1)])
            # stage 0 also emits its fused microbatch for collection
            return act_next, (payload[..., 3:4], seg)

        init = jnp.zeros((mb, h, w, 4), ir.dtype)
        _, (fused_ticks, seg_ticks) = lax.scan(tick, init, jnp.arange(m + 1))
        # valid outputs: fused from ticks 0..m-1 (stage 0), seg from ticks
        # 1..m (stage 1). Keep a per-device leading axis of 1 so out_specs
        # can stack the two pp members; the caller indexes the right stage.
        fused_dev = fused_ticks[:m].reshape(m * mb, h, w, 1)[None]
        seg_dev = seg_ticks[1:].reshape((m * mb,) + seg_shape.shape[1:])[None]
        return fused_dev, seg_dev

    specs = dict(
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis)),
        out_specs=(P(pp_axis, data_axis), P(pp_axis, data_axis)),
    )
    try:  # replication checking must be off: lax.cond branches on axis_index
        mapped = shard_map(fwd, check_vma=False, **specs)  # jax >= 0.8
    except TypeError:  # pragma: no cover
        mapped = shard_map(fwd, check_rep=False, **specs)

    def pp_forward(variables, ir, vis):
        fused2, seg2 = mapped(variables, ir, vis)
        return fused2[0], seg2[1]  # stage-0 devices hold fused, stage-1 seg

    return pp_forward


def split_variables_pp(variables):
    """Split a PAIFJoint variable tree into (stage-0, stage-1) subtrees.

    Stage 0 owns the fusion branch (`enhance_net` + the parameterless
    normalize chain); stage 1 owns the SegFormer (`denoise_net`). Each
    stage's devices then hold ONLY their stage's parameters — real pipeline
    parameter sharding, unlike the replicated-params shard_map schedule.
    """
    v0, v1 = {}, {}
    for col, tree in variables.items():
        s0 = {k: v for k, v in tree.items() if k != "denoise_net"}
        s1 = {k: v for k, v in tree.items() if k == "denoise_net"}
        if s0:
            v0[col] = s0
        if s1:
            v1[col] = s1
    return v0, v1


def make_pp_forward_multijit(
    model,
    mesh0: Mesh,
    mesh1: Mesh,
    data_axis: str = "data",
):
    """2-stage pipeline as two pjit programs on disjoint submeshes.

    TPU-native composition of DP x TP x PP: each stage is an ordinary
    GSPMD program on its own (data[, model]) submesh — stage 0 the fusion
    branch, stage 1 the SegFormer — so tensor-parallel parameter shardings
    (parallel/tp.shard_params_tp over mesh1) stay fully live inside each
    stage, with no collectives in divergent control flow (the deadlock of
    the single-shard_map + auto-TP form). The stage handoff is one
    `jax.device_put` of the normalized RGB activation per microbatch;
    dispatch is async, so stage 0 of microbatch t overlaps stage 1 of
    microbatch t-1 exactly like a GPipe schedule.

    Usage:
        v0, v1 = split_variables_pp(variables)          # per-stage params
        v1 = shard_params_tp(mesh1, v1)                 # optional TP
        fwd = make_pp_forward_multijit(model, mesh0, mesh1)
        fused, seg = fwd(v0, v1, ir_microbatches, vis_microbatches)

    Scope: inference/eval forward, like `make_pp_forward`.
    """
    d0 = NamedSharding(mesh0, P(data_axis))
    d1 = NamedSharding(mesh1, P(data_axis))

    @jax.jit
    def stage0(v0, ir_mb, vis_mb):
        fused = model.apply(v0, ir_mb, vis_mb, method=lambda m, i, s: m.fuse(i, s))
        x_seg = model.apply(v0, fused, vis_mb, method=lambda m, f, s: m.seg_input(f, s))
        return fused, x_seg

    @jax.jit
    def stage1(v1, x_seg):
        return model.apply(v1, x_seg, method=lambda m, x: m.denoise_net(x))

    def pp_forward(v0, v1, ir, vis, microbatches: int):
        n = ir.shape[0]
        assert n % microbatches == 0, (n, microbatches)
        mb = n // microbatches
        fused_out, seg_out = [], []
        inflight = []  # GPipe steady state: stage1(t-1) overlaps stage0(t)
        for t in range(microbatches):
            ir_mb = jax.device_put(ir[t * mb : (t + 1) * mb], d0)
            vis_mb = jax.device_put(vis[t * mb : (t + 1) * mb], d0)
            fused, x_seg = stage0(v0, ir_mb, vis_mb)
            fused_out.append(fused)
            inflight.append(jax.device_put(x_seg, d1))
            if len(inflight) > 1:  # drain the previous microbatch into stage 1
                seg_out.append(stage1(v1, inflight.pop(0)))
        seg_out.append(stage1(v1, inflight.pop(0)))
        return jnp.concatenate(fused_out), jnp.concatenate(seg_out)

    return pp_forward


def make_pp_train_step(
    model,
    mesh0: Mesh,
    mesh1: Mesh,
    fusion_loss_fn,
    fusion_weight: float = 0.1,
    seg_weight: float = 4.0,
    data_axis: str = "data",
):
    """2-stage GPipe TRAINING schedule on disjoint submeshes (round 5).

    Closes the PP-is-eval-only scope limit (PARITY.md §2.9): the standard
    joint training objective (train/aat.joint_loss — 0.1*fusion + 4*seg CE,
    reference `_loss` core/model_fusion_auto.py:1093-1100) runs with stage 0
    (fusion branch + normalize chain, its params AND BatchNorm stats) on
    mesh0 and stage 1 (SegFormer, dropout/droppath rngs) on mesh1, each an
    ordinary GSPMD program over its own (data[, model]) submesh.

    Schedule per global batch of M microbatches (GPipe with recompute):
      fwd loop:  stage0_fwd(t) for t=0..M-1 — emits x_seg(t), chains the
                 BN stats; only x_seg (mb,H,W,3) crosses the meshes.
      bwd loop:  stage1_grad(t) -> (d v1, d_xseg) on mesh1, then
                 stage0_grad(t) on mesh0 RECOMPUTES its forward (no stored
                 activations) and backprops fusion loss + <x_seg, d_xseg>.
                 The two run on disjoint submeshes, so async dispatch
                 overlaps stage1_grad(t+1) with stage0_grad(t) — the GPipe
                 steady state.
      update:    per-microbatch grads averaged, one optimizer step per
                 stage (disjoint param subtrees: elementwise AdamW per
                 stage == the single-tree update).

    Microbatching semantics match sequential gradient accumulation (each
    microbatch's grads at its own running BN stats, stats chained fwd) —
    verified to 1e-5 against the single-device reference in
    tests/test_pp.py::test_pp_train_step_matches_grad_accum.

    Scope: the standard joint step. AAT's in-step PGD crafting
    differentiates through BOTH stages per attack iter, which would ping-
    pong activations across the pipeline boundary 2K times per step — on
    one host that serializes; AAT stays on the DP path (train/aat.py).

    Returns step(state0, state1, ir, vis, mask, labels, key, microbatches)
    -> (state0', state1', metrics).
    """
    from paif_tpu.ops.color import rgb_to_ycrcb
    from paif_tpu.ops.losses import cross_entropy_ignore
    from paif_tpu.ops.resize import resize_bilinear

    d0 = NamedSharding(mesh0, P(data_axis))
    d1 = NamedSharding(mesh1, P(data_axis))

    @jax.jit
    def stage0_fwd(v0p, v0s, ir, vis):
        (fused), mut = model.apply(
            {"params": v0p, "batch_stats": v0s},
            ir,
            vis,
            True,
            method=lambda mm, i, s, tr: mm.fuse(i, s, tr),
            mutable=["batch_stats"],
        )
        x_seg = model.apply(
            {"params": v0p}, fused, vis, method=lambda mm, f, s: mm.seg_input(f, s)
        )
        return x_seg, mut["batch_stats"]

    @jax.jit
    def stage1_grad(v1p, v1s, x_seg, labels, key):
        # the SegFormer head carries BatchNorm stats (decoder fuse_norm):
        # mutable forward, stats chained across microbatches by the caller
        def loss(v1p_, x_):
            seg, mut = model.apply(
                {"params": v1p_, "batch_stats": v1s},
                x_,
                method=lambda mm, x: mm.denoise_net(x, train=True),
                mutable=["batch_stats"],
                rngs={"dropout": key, "droppath": jax.random.fold_in(key, 1)},
            )
            out = resize_bilinear(seg, labels.shape[1:3], align_corners=False)
            ce = cross_entropy_ignore(out, labels)
            return seg_weight * ce, (ce, mut["batch_stats"])

        (_, (ce, new_s)), (g_v1, d_xseg) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(v1p, x_seg)
        return ce, g_v1, d_xseg, new_s

    @jax.jit
    def stage0_grad(v0p, v0s, ir, vis, mask, d_xseg):
        def loss(v0p_):
            fused = model.apply(
                {"params": v0p_, "batch_stats": v0s},
                ir,
                vis,
                True,
                method=lambda mm, i, s, tr: mm.fuse(i, s, tr),
                mutable=["batch_stats"],
            )[0]
            x_seg = model.apply(
                {"params": v0p_}, fused, vis, method=lambda mm, f, s: mm.seg_input(f, s)
            )
            enh = fusion_loss_fn(ir, rgb_to_ycrcb(vis), fused, mask)
            # <x_seg, d_xseg> seeds the pipeline cotangent; its grad wrt
            # v0p is exactly the chain rule through the stage boundary
            total = fusion_weight * enh + jnp.sum(x_seg * d_xseg)
            return total, enh

        (_, enh), g_v0 = jax.value_and_grad(loss, has_aux=True)(v0p)
        return enh, g_v0

    def step(state0, state1, ir, vis, mask, labels, key, microbatches: int):
        n = ir.shape[0]
        assert n % microbatches == 0, (n, microbatches)
        mb = n // microbatches
        stats = state0.batch_stats
        stats_per_t, xsegs = [], []
        for t in range(microbatches):
            sl = slice(t * mb, (t + 1) * mb)
            stats_per_t.append(stats)
            x_seg, stats = stage0_fwd(
                state0.params,
                stats,
                jax.device_put(ir[sl], d0),
                jax.device_put(vis[sl], d0),
            )
            xsegs.append(jax.device_put(x_seg, d1))
        g0_acc = g1_acc = None
        ce_sum = enh_sum = 0.0
        stats1 = state1.batch_stats
        for t in range(microbatches):
            sl = slice(t * mb, (t + 1) * mb)
            ce, g_v1, d_xseg, stats1 = stage1_grad(
                state1.params,
                stats1,
                xsegs[t],
                jax.device_put(labels[sl], d1),
                jax.random.fold_in(key, t),
            )
            enh, g_v0 = stage0_grad(
                state0.params,
                stats_per_t[t],
                jax.device_put(ir[sl], d0),
                jax.device_put(vis[sl], d0),
                jax.device_put(mask[sl], d0),
                jax.device_put(d_xseg, d0),
            )
            add = lambda a, b: b if a is None else jax.tree_util.tree_map(jnp.add, a, b)
            g0_acc, g1_acc = add(g0_acc, g_v0), add(g1_acc, g_v1)
            ce_sum, enh_sum = ce_sum + ce, enh_sum + enh
        scale = 1.0 / microbatches
        g0 = jax.tree_util.tree_map(lambda g: g * scale, g0_acc)
        g1 = jax.tree_util.tree_map(lambda g: g * scale, g1_acc)
        state0 = state0.apply_gradients(g0, stats)
        state1 = state1.apply_gradients(g1, stats1)
        # ce lives on mesh1, enh on mesh0 — combine on host (two syncs/step)
        ce_m, enh_m = float(ce_sum) * scale, float(enh_sum) * scale
        metrics = {
            "seg_ce": ce_m,
            "fusion": enh_m,
            "loss": seg_weight * ce_m + fusion_weight * enh_m,
        }
        return state0, state1, metrics

    return step
