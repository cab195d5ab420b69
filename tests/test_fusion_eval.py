"""Fusion-only CLI + feature dump smoke tests; show-features weight sharing."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from paif_tpu.genotype import PAIF_GENOTYPE
from paif_tpu.models import FusionNetSearched
from paif_tpu.models.fusion_ablation import FusionNetSearchedShow

TINY = os.path.join(os.path.dirname(__file__), "..", "paif_tpu", "configs", "tiny_b0.yaml")


def test_show_features_shares_weights(rng):
    """FusionNetSearchedShow must accept FusionNetSearched params and return
    the identical fused output plus intermediates."""
    base = FusionNetSearched(8, PAIF_GENOTYPE)
    show = FusionNetSearchedShow(8, PAIF_GENOTYPE)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 24, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, 24, 32, 3)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), ir, vis)
    fused_base = base.apply(variables, ir, vis)
    fused_show, inter = show.apply(variables, ir, vis)
    np.testing.assert_allclose(np.asarray(fused_base), np.asarray(fused_show), atol=1e-6)
    assert set(inter) == {"lf_ir", "hf_ir", "res_ir", "lf_vis", "hf_vis", "res_vis", "gate"}
    assert inter["gate"].shape == (1, 24, 32, 1)


def test_fuse_cli(tmp_path):
    from paif_tpu.cli.fuse import main

    n = main(["--config", TINY, "--save_dir", str(tmp_path), "--features"])
    assert n == 3
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".png")]) >= 3
    # feature dump directory for the first sample
    sub = [d for d in os.listdir(tmp_path) if os.path.isdir(tmp_path / d)]
    assert sub, "expected a feature-dump directory"
