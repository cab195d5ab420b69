"""Torch value parity for the ablation fusion family (VERDICT r1 partials
#18/19/20): DRDB, SKFF, Fusion_Network (DRDB trunk), Fusion_Network2 (SKFF
injections), and the aggregation-strategy nets Fusion_Network_auto /
_Average / _Max / _SPA / _Direct (model_fusion_auto.py:118-260, 1191-1444).

Fusion_Network_Add is NOT tested: it instantiates Cell_Chain2, which is
undefined anywhere upstream — the class cannot be constructed in the
reference (see PARITY.md deliberate omissions).

Weights flow through io.torch_import entry lists, so these also extend the
importer's verified surface.
"""

from collections import namedtuple

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_stubs import install_reference_stubs

install_reference_stubs()

from paif_tpu.io.torch_import import (  # noqa: E402
    Entry,
    _conv,
    chain_entries,
    to_flax_variables,
)
from paif_tpu.models.fusion_ablation import (  # noqa: E402
    FusionNetworkDRDB,
    FusionNetworkSKFF,
    TwoStreamFusion,
)
from paif_tpu.nn.support import DRDB, SKFF  # noqa: E402

RefGenotype = namedtuple("Genotype", "normal normal_concat")
CHAIN_OPS = ("Denseblocks_3_1", "Denseblocks_3_1")
REF_GENO = RefGenotype(normal=[(op, i) for i, op in enumerate(CHAIN_OPS)], normal_concat=[1, 2])


def torch_state(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def drdb_entries(fp, tp):
    p = f"{tp}." if tp else ""
    e = []
    for i in range(1, 6):
        e += _conv(fp + (f"dconv{i}",), f"{p}Dcov{i}", bias=True)
    e += _conv(fp + ("conv_out",), f"{p}conv", bias=True)
    return e


def skff_entries(fp, tp, height=2):
    p = f"{tp}." if tp else ""
    e = _conv(fp + ("conv_du",), f"{p}conv_du.0")
    e.append(Entry("params", fp + ("du_act", "alpha"), f"{p}conv_du.1.weight"))
    for i in range(height):
        e += _conv(fp + (f"fc{i}",), f"{p}fcs.{i}")
    return e


def test_drdb_parity(rng):
    from core.model_fusion_auto import DRDB as RefDRDB

    torch.manual_seed(0)
    ref = RefDRDB(in_ch=64).eval()
    x = rng.normal(0, 1, (1, 64, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = DRDB(64)
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    v = to_flax_variables(torch_state(ref), drdb_entries((), ""), template=variables)
    got = model.apply(v, nhwc(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5, rtol=1e-4
    )


def test_skff_parity(rng):
    from core.model_fusion_auto import SKFF as RefSKFF

    torch.manual_seed(0)
    ref = RefSKFF(64, height=2).eval()
    a = rng.normal(0, 1, (2, 64, 8, 12)).astype(np.float32)
    b = rng.normal(0, 1, (2, 64, 8, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref([torch.from_numpy(a), torch.from_numpy(b)]).numpy()

    model = SKFF(height=2)
    feats = [nhwc(a), nhwc(b)]
    variables = model.init(jax.random.PRNGKey(0), feats)
    v = to_flax_variables(torch_state(ref), skff_entries((), ""), template=variables)
    got = model.apply(v, feats)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5, rtol=1e-4
    )


def test_fusion_network_drdb_parity(rng):
    from core.model_fusion_auto import Fusion_Network

    torch.manual_seed(0)
    ref = Fusion_Network().eval()
    ir = rng.uniform(0, 1, (1, 1, 16, 24)).astype(np.float32)
    vis = rng.uniform(0, 1, (1, 1, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(ir), torch.from_numpy(vis)).numpy()

    e = _conv(("conv1",), "conv1", bias=True)
    e += drdb_entries(("drdb1",), "DRDB1") + drdb_entries(("drdb2",), "DRDB2")
    e += _conv(("conv2",), "conv2", bias=True) + _conv(("conv21",), "conv21", bias=True)
    e.append(Entry("params", ("act", "alpha"), "relu.weight"))

    model = FusionNetworkDRDB()
    variables = model.init(jax.random.PRNGKey(0), nhwc(ir), nhwc(vis))
    v = to_flax_variables(torch_state(ref), e, template=variables)
    got = model.apply(v, nhwc(ir), nhwc(vis))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-5, rtol=1e-4
    )


def test_fusion_network_skff_parity(rng):
    from core.model_fusion_auto import Fusion_Network2

    torch.manual_seed(0)
    ref = Fusion_Network2().eval()
    ir = rng.uniform(0, 1, (1, 1, 16, 24)).astype(np.float32)
    vis = rng.uniform(0, 1, (1, 1, 16, 24)).astype(np.float32)
    out1 = rng.normal(0, 1, (1, 64, 16, 24)).astype(np.float32)
    out2 = rng.normal(0, 1, (1, 128, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(ir), torch.from_numpy(vis),
            torch.from_numpy(out1), torch.from_numpy(out2),
        ).numpy()

    e = _conv(("conv1",), "conv1", bias=True)
    e += drdb_entries(("drdb1",), "DRDB1") + drdb_entries(("drdb2",), "DRDB2")
    e += skff_entries(("skff",), "skff") + skff_entries(("skff2",), "skff2")
    e += _conv(("conv3",), "conv3", bias=True) + _conv(("conv4",), "conv4", bias=True)
    e += _conv(("conv2",), "conv2", bias=True)
    e.append(Entry("params", ("act", "alpha"), "relu.weight"))

    model = FusionNetworkSKFF()
    variables = model.init(jax.random.PRNGKey(0), nhwc(ir), nhwc(vis), nhwc(out1), nhwc(out2))
    v = to_flax_variables(torch_state(ref), e, template=variables)
    got = model.apply(v, nhwc(ir), nhwc(vis), nhwc(out1), nhwc(out2))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-5, rtol=1e-4
    )


@pytest.mark.parametrize(
    "aggregate,ref_cls",
    [
        ("concat", "Fusion_Network_auto"),
        ("average", "Fusion_Network_Average"),
        ("max", "Fusion_Network_Max"),
        ("spa", "Fusion_Network_SPA"),
        ("direct", "Fusion_Network_Direct"),
    ],
)
def test_two_stream_fusion_parity(rng, aggregate, ref_cls):
    import core.model_fusion_auto as mfa

    torch.manual_seed(0)
    ref = getattr(mfa, ref_cls)(REF_GENO).eval()
    ir = rng.uniform(0, 1, (1, 1, 16, 24)).astype(np.float32)
    vis = rng.uniform(0, 1, (1, 1, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(ir), torch.from_numpy(vis)).numpy()

    e = _conv(("conv1",), "conv1", bias=True)
    e += chain_entries(CHAIN_OPS, ("chain_ir",), "DRDB_ir")
    e += chain_entries(CHAIN_OPS, ("chain_agg",), "DRDB_aggregation")
    if aggregate != "direct":
        e += _conv(("conv12",), "conv12", bias=True)
        e += chain_entries(CHAIN_OPS, ("chain_vis",), "DRDB_vis")
    if aggregate == "concat":
        e += _conv(("conv_concat",), "conv_concat", bias=True)
    if aggregate == "spa":
        e += _conv(("spa", "spatial", "conv"), "spa.spatial.conv")
    e += _conv(("conv2",), "conv2", bias=True) + _conv(("conv21",), "conv21", bias=True)
    e.append(Entry("params", ("act", "alpha"), "relu.weight"))

    model = TwoStreamFusion(aggregate=aggregate, chain_ops=CHAIN_OPS)
    variables = model.init(jax.random.PRNGKey(0), nhwc(ir), nhwc(vis))
    v = to_flax_variables(torch_state(ref), e, template=variables)
    got = model.apply(v, nhwc(ir), nhwc(vis))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-5, rtol=1e-4
    )
