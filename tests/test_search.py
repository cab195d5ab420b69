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
    make_bilevel_search_step,
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


def test_bilevel_search_step(rng):
    """First-order bilevel: alphas move with the VAL split, weights with the
    TRAIN split (VERDICT round-1 missing #5)."""
    primitives = ("Denseblocks_3_1", "DilConv_3_2", "ECAattention_3")
    model = SuperFusionNet(features=8, steps=2, primitives=primitives)
    ir_t = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 1)), jnp.float32)
    vis_t = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 3)), jnp.float32)
    ir_v = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 1)), jnp.float32)
    vis_v = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 3)), jnp.float32)
    mask_t = jnp.maximum(ir_t, vis_t[..., 0:1])
    mask_v = jnp.maximum(ir_v, vis_v[..., 0:1])
    variables = model.init(jax.random.PRNGKey(0), ir_t, vis_t)

    state = create_search_state(model, variables, lr=1e-3)
    step = make_bilevel_search_step(model, fusion_loss_grad2)

    a0 = np.asarray(state.params["chain1"]["op0"]["alpha"])
    w0 = np.asarray(state.params["stem_1"]["kernel"])
    losses = []
    for _ in range(3):
        state, tl, vl = step(state, (ir_t, vis_t, mask_t), (ir_v, vis_v, mask_v))
        losses.append((float(tl), float(vl)))
    assert np.isfinite(losses).all()
    assert not np.allclose(a0, np.asarray(state.params["chain1"]["op0"]["alpha"]))
    assert not np.allclose(w0, np.asarray(state.params["stem_1"]["kernel"]))

    # identical splits -> bilevel == single-level gradient sources; the step
    # must still be well-formed (no NaNs, loss finite)
    state2, tl2, vl2 = step(state, (ir_t, vis_t, mask_t), (ir_t, vis_t, mask_t))
    assert np.isfinite(float(tl2)) and float(tl2) == float(vl2)


def test_derive_genotype_roundtrip_handset_alphas(rng):
    """Hand-set alpha patterns must derive exactly the intended genotype
    (argmax per slot, slot order op0, op1, ...)."""
    primitives = ("Denseblocks_3_1", "DilConv_3_2", "ECAattention_3")
    model = SuperFusionNet(features=8, steps=2, primitives=primitives)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 24, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, 24, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ir, vis)

    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        variables["params"], "unfreeze"
    ) else dict(variables["params"])
    want = {
        "chain1": [0, 2],  # op0 -> Denseblocks, op1 -> ECA
        "chain2": [1, 1],
        "chain3": [2, 0],
    }
    for chain, picks in want.items():
        for slot, pick in enumerate(picks):
            a = np.full((len(primitives),), -5.0, np.float32)
            a[pick] = 5.0
            params[chain][f"op{slot}"]["alpha"] = jnp.asarray(a)

    geno = derive_genotype(params, primitives)
    assert geno.normal_1 == ((primitives[0], 0), (primitives[2], 1))
    assert geno.normal_2 == ((primitives[1], 0), (primitives[1], 1))
    assert geno.normal_3 == ((primitives[2], 0), (primitives[0], 1))


def test_full_primitive_pool_parses():
    from paif_tpu.nn.ops_registry import parse_op_string

    for p in PRIMITIVES_BLOCK:
        name, k, d = parse_op_string(p)
        assert k in (3, 5, 7)
