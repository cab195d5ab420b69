"""NAS search scaffold: supernet runs, alphas update, genotype derives and
the derived architecture instantiates."""

import numpy as np
import jax
import jax.numpy as jnp

from paif_tpu.losses.fusion import fusion_loss_grad2
from paif_tpu.models.fusion_searched import FusionNetSearched
from paif_tpu.search import (
    PRIMITIVES_BLOCK,
    SuperFusionNet,
    create_search_state,
    derive_genotype,
    make_search_step,
)


def test_search_step_and_derive(rng):
    primitives = ("Denseblocks_3_1", "DilConv_3_2", "ECAattention_3")  # small pool for CI
    model = SuperFusionNet(features=8, steps=2, primitives=primitives)
    ir = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 3)), jnp.float32)
    mask = jnp.maximum(ir, vis[..., 0:1])
    variables = model.init(jax.random.PRNGKey(0), ir, vis)

    state = create_search_state(model, variables, lr=1e-3)
    step = make_search_step(model, fusion_loss_grad2)
    a0 = np.asarray(state.params["chain1"]["op0"]["alpha"])
    losses = []
    for _ in range(4):
        state, loss = step(state, ir, vis, mask)
        losses.append(float(loss))
    a1 = np.asarray(state.params["chain1"]["op0"]["alpha"])
    assert np.isfinite(losses).all()
    assert not np.allclose(a0, a1), "architecture parameters did not move"

    geno = derive_genotype(state.params, primitives)
    assert len(geno.normal_1) == 2 and len(geno.normal_3) == 2
    for name, _ in geno.normal_1 + geno.normal_2 + geno.normal_3:
        assert name in primitives
    # the derived genotype must build a concrete fusion net
    net = FusionNetSearched(features=8, genotype=geno)
    v = net.init(jax.random.PRNGKey(1), ir, vis)
    out = net.apply(v, ir, vis)
    assert out.shape == (2, 24, 32, 1)


def test_full_primitive_pool_parses():
    from paif_tpu.nn.ops_registry import parse_op_string

    for p in PRIMITIVES_BLOCK:
        name, k, d = parse_op_string(p)
        assert k in (3, 5, 7)
