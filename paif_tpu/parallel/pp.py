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
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_pp_forward(model, mesh: Mesh, microbatches: int, data_axis="data", pp_axis="pp"):
    """Returns fn(variables, ir, vis) -> (fused, seg) pipelined over 2 stages.

    The global batch must be divisible by (data-axis size) * microbatches.
    Output values equal the single-device forward (same math per
    microbatch; per-image normalization keeps microbatching exact).
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
