"""IO tests: Orbax round-trip; torch-import strict=False semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from paif_tpu.genotype import PAIF_GENOTYPE
from paif_tpu.io.checkpoint import load_variables, save_variables
from paif_tpu.io.torch_import import fusion_entries, to_flax_variables
from paif_tpu.models import FusionNetSearched


def _tiny_variables(rng):
    model = FusionNetSearched(8, PAIF_GENOTYPE)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), ir, vis), (ir, vis)


def test_orbax_round_trip(tmp_path, rng):
    model, variables, (ir, vis) = _tiny_variables(rng)
    out_before = model.apply(variables, ir, vis)
    save_variables(str(tmp_path / "ckpt"), variables)
    restored = load_variables(str(tmp_path / "ckpt"), variables)
    out_after = model.apply(restored, ir, vis)
    np.testing.assert_array_equal(np.asarray(out_before), np.asarray(out_after))


def test_torch_import_tolerates_missing_keys(rng, caplog):
    """strict=False reference semantics (robust_test.py:263): missing torch
    keys keep their initialized values; extra torch keys are ignored."""
    model, variables, (ir, vis) = _tiny_variables(rng)
    entries = fusion_entries(PAIF_GENOTYPE)
    # fabricate a state dict covering ONLY the stems, plus a junk key
    sd = {
        "stem_1.0.weight": rng.normal(0, 1, (8, 1, 3, 3)).astype(np.float32),
        "stem_1.1.weight": np.array([0.1], np.float32),
        "some.unknown.key": np.zeros(3, np.float32),
    }
    merged = to_flax_variables(sd, entries, template=variables)
    got = np.asarray(merged["params"]["stem_1"]["kernel"])
    np.testing.assert_allclose(got, sd["stem_1.0.weight"].transpose(2, 3, 1, 0))
    # untouched leaves keep their init values
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["stem_2"]["kernel"]),
        np.asarray(variables["params"]["stem_2"]["kernel"]),
    )
    # model still applies
    out = model.apply(merged, ir, vis)
    assert np.isfinite(np.asarray(out)).all()


def test_torch_import_shape_mismatch_raises(rng):
    model, variables, _ = _tiny_variables(rng)
    entries = fusion_entries(PAIF_GENOTYPE)
    sd = {"stem_1.0.weight": np.zeros((4, 1, 3, 3), np.float32)}  # wrong C
    try:
        to_flax_variables(sd, entries, template=variables)
        assert False, "expected shape mismatch"
    except ValueError as e:
        assert "shape mismatch" in str(e)


def test_load_torch_pth_file_end_to_end(tmp_path, rng):
    """torch.save'd state dict -> load_any_checkpoint -> identical outputs
    (the reference checkpoint ingestion path, robust_test.py:259-263)."""
    import torch

    from tests.reference_stubs import install_reference_stubs

    install_reference_stubs()
    from core.model_fusion_auto import Network_Fusion_Searched
    from tests.test_torch_parity import to_ref_genotype

    from paif_tpu.io.checkpoint import load_any_checkpoint

    torch.manual_seed(7)
    ref = Network_Fusion_Searched(8, None, to_ref_genotype(PAIF_GENOTYPE)).eval()
    pth = tmp_path / "fusion.pth"
    torch.save(ref.state_dict(), str(pth))

    model = FusionNetSearched(8, PAIF_GENOTYPE)
    ir = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), ir, vis)
    variables = load_any_checkpoint(str(pth), fusion_entries(PAIF_GENOTYPE), template)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(np.asarray(ir).transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(vis).transpose(0, 3, 1, 2)),
        ).numpy()
    got = np.asarray(model.apply(variables, ir, vis))
    np.testing.assert_allclose(got[..., 0], want[:, 0], atol=2e-5, rtol=1e-4)


def test_load_any_checkpoint_accepts_train_state_dir(tmp_path):
    """Eval CLIs pointed at a train_aat step_N dir (full train state incl.
    opt_state) must load its params/batch_stats as variables (round-5 fix:
    the template-shaped orbax restore fails on the extra subtrees)."""
    import jax
    import jax.numpy as jnp
    import optax

    from paif_tpu.io.checkpoint import load_any_checkpoint, save_train_state
    from paif_tpu.train.aat import TrainState

    params = {"dense": {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}}
    bs = {"norm": {"mean": jnp.full((3,), 0.5)}}
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats=bs,
        opt_state=tx.init(params),
        tx=tx,
    )
    path = str(tmp_path / "step_7")
    save_train_state(path, state)

    template = {"params": jax.tree_util.tree_map(jnp.zeros_like, params),
                "batch_stats": jax.tree_util.tree_map(jnp.zeros_like, bs)}
    out = load_any_checkpoint(path, template=template)
    assert set(out) == {"params", "batch_stats"}
    np.testing.assert_array_equal(out["params"]["dense"]["w"], np.ones((3, 3)))
    np.testing.assert_array_equal(out["batch_stats"]["norm"]["mean"], np.full((3,), 0.5))
