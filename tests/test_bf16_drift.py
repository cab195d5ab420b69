"""bf16 fast path vs f32 parity path: accuracy drift bound (VERDICT r1 #5).

The benchmark and production fast path run bf16 params/inputs with
PAIF_PRECISION=default, while every parity test runs f32/HIGHEST. This test
bounds what the fast path costs: same weights, same synthetic dataset, eval
protocol mIoU must agree within 0.2 points (the BASELINE.md north-star
tolerance). The real-chip b3 number is recorded in BASELINE.md via
scripts/bench_bf16_drift.py; this CPU test guards the invariant at b0 scale.
"""

import numpy as np

from paif_tpu.data.synthetic import SyntheticFusionDataset
from paif_tpu.eval.harness import EvalConfig, run_eval
from paif_tpu.genotype import PAIF_GENOTYPE
from paif_tpu.models import FusionNetSearched, PAIFJoint


def test_bf16_eval_drift_small(monkeypatch):
    import jax
    import jax.numpy as jnp

    model = PAIFJoint(
        backbone="mit_b0",
        num_classes=9,
        fusion=lambda: FusionNetSearched(16, PAIF_GENOTYPE),
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    ds = SyntheticFusionDataset(n=4, hw=(64, 64), seed=0)

    monkeypatch.setenv("PAIF_PRECISION", "highest")
    m32 = run_eval(model, variables, ds, EvalConfig(batch_size=2, use_mesh=False))

    monkeypatch.setenv("PAIF_PRECISION", "default")
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    vb = dict(variables, params=bf16(variables["params"]))
    mbf = run_eval(
        model, vb, ds, EvalConfig(batch_size=2, use_mesh=False, input_dtype="bfloat16")
    )

    drift_miou = abs(mbf["iou_mean"] - m32["iou_mean"]) * 100
    drift_macc = abs(mbf["acc_mean"] - m32["acc_mean"]) * 100
    assert np.isfinite(drift_miou)
    assert drift_miou < 0.2, f"bf16 mIoU drift {drift_miou:.3f} pts >= 0.2"
    assert drift_macc < 0.5, f"bf16 mAcc drift {drift_macc:.3f} pts"
