"""Zoo smoke tests: shapes and finiteness at small resolution. Parity with
the reference zoo is structural (these are comparison baselines trained
separately; the reference ships no zoo checkpoints)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from paif_tpu.models.registry import FUSION_ZOO, seg_zoo

H, W = 32, 32


@pytest.mark.parametrize("name", ["u2fusion", "seafusion", "sdnet", "reconet", "did", "bffusion", "drdb", "auto_concat", "auto_spa", "add", "average", "max"])
def test_fusion_zoo_shapes(rng, name):
    model = FUSION_ZOO[name]()
    ir = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ir, vis)
    out = model.apply(variables, ir, vis)
    assert out.shape == (1, H, W, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["lasnet", "egfnet", "gmnet"])
def test_seg_zoo_shapes(rng, name):
    model = seg_zoo()[name](n_classes=9)
    depth = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), depth, rgb)
    out = model.apply(variables, depth, rgb)
    assert out.shape == (1, 64, 64, 9)
    assert np.isfinite(np.asarray(out)).all()
