"""Non-toy SPMD exercise (VERDICT r4 item 6/7): flagship-like shapes on the
8-device virtual CPU mesh.

The driver's dryrun_multichip proves the collectives at 64x64/mit_b0-tiny/
feats=8 — but the production interactions it never touches are exactly the
ones round 4 found bugs in off-mesh: the 2x2 packed layout (feats=32 ->
128 lanes), the dense block-diagonal depthwise routing, batch PADDING
(masked confusion rows), and remat. This runs, at 240x320 / mit_b0 /
feats=32 / PAIF_PACKED=1:

  1. DP eval via the production `run_eval` harness: 12 synthetic pairs at
     batch 8 -> the last batch carries 4 padded rows (valid-mask psum path);
     metrics must EQUAL a single-device run of the same data.
  2. One AAT train step (PGD-1 inside) on the 8-device mesh, batch 8,
     remat model — the full train path at packed-layout shapes.

Run: python scripts/dryrun_nontoy.py  (CPU; ~minutes, bounded by caller)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PAIF_PRECISION", "default")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

import numpy as np


def main():
    t00 = time.time()
    import jax.numpy as jnp

    from paif_tpu.attack.pgd import AttackConfig
    from paif_tpu.data.synthetic import make_synthetic_dataset
    from paif_tpu.data.datasets import FusionDataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint
    from paif_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from paif_tpu.train.aat import TrainConfig, create_train_state, make_aat_train_step

    assert jax.device_count() == 8, jax.devices()
    H, W = 240, 320
    import tempfile

    tmp = tempfile.mkdtemp()
    make_synthetic_dataset(tmp, n=12, hw=(H, W))
    ds = FusionDataset(
        ir_path=os.path.join(tmp, "Infrared"),
        vi_path=os.path.join(tmp, "Visible"),
        label_path=os.path.join(tmp, "Label"),
    )
    model = PAIFJoint(
        backbone="mit_b0",
        num_classes=9,
        fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    print(f"setup {time.time() - t00:.1f}s", flush=True)

    # 1. mesh eval (batch 8 over 8 devices; 12 images -> last batch 4 padded)
    t0 = time.time()
    m_mesh = run_eval(model, variables, ds, EvalConfig(batch_size=8, use_mesh=True))
    print(f"mesh eval {time.time() - t0:.1f}s  mIoU={m_mesh['iou_mean']:.6f}", flush=True)
    t0 = time.time()
    m_one = run_eval(model, variables, ds, EvalConfig(batch_size=8, use_mesh=False))
    print(f"single eval {time.time() - t0:.1f}s  mIoU={m_one['iou_mean']:.6f}", flush=True)
    # Tolerance, not equality: the sharded (per-device batch 1) and
    # unsharded (batch 8) programs are DIFFERENT compilations — bf16
    # codegen/fusion order differs, flipping argmaxes at near-ties. First
    # run measured |d mIoU| = 1.8e-8 (bench_logs/r5/dryrun_nontoy.log);
    # anything above 1e-4 would indicate a real sharding bug (wrong psum,
    # padded-row leakage), not rounding.
    assert abs(m_mesh["iou_mean"] - m_one["iou_mean"]) < 1e-4, (m_mesh, m_one)
    assert abs(m_mesh["acc_mean"] - m_one["acc_mean"]) < 1e-4, (m_mesh, m_one)
    print("DP eval @ 240x320 packed, padded batch: mesh == single-device OK", flush=True)

    # 2. one AAT train step on the mesh at the same shape (remat model, PGD-1)
    t0 = time.time()
    model_r = PAIFJoint(
        backbone="mit_b0",
        num_classes=9,
        fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
        remat=True,
    )
    tcfg = TrainConfig(max_iter=10, warmup_iter=2, attack=AttackConfig(iters=1))
    state = create_train_state(model_r, variables, tcfg)
    mesh = make_mesh()
    state = replicate(mesh, state)
    step_fn = make_aat_train_step(model_r, tcfg)
    rng = np.random.default_rng(0)
    ir = rng.uniform(0, 1, (8, H, W, 1)).astype(np.float32)
    vis = rng.uniform(0, 1, (8, H, W, 3)).astype(np.float32)
    mask = np.maximum(ir, vis.mean(-1, keepdims=True)).astype(np.float32)
    labels = rng.integers(0, 9, (8, H, W)).astype(np.int32)
    args = shard_batch(mesh, (ir, vis, mask, labels))
    state, metrics = step_fn(state, *args, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"AAT step @ 240x320 packed on 8-dev mesh OK, loss={loss:.4f} "
          f"({time.time() - t0:.1f}s)", flush=True)
    print(f"dryrun_nontoy: ALL OK ({time.time() - t00:.1f}s total)", flush=True)


if __name__ == "__main__":
    main()
