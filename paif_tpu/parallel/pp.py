"""Pipeline parallelism (GPipe-style) for the joint model over a `pp` mesh
axis: stage 0 = fusion branch + normalize chain, stage 1 = SegFormer.

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
