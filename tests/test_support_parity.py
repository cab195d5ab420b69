"""Torch value parity for the support blocks (VERDICT r1 partial #26):
blur-pool ResidualDownSample/DownSample/ResidualUpSample/UpSample,
SE_TVLayer/TVBasicBlock, EnhanceResidualModule, ReLUConvBN
(operations_m.py:206-338, 466-492).

Reference quirks exercised:
  * TVBasicBlock passes `reduction` into SE_TVLayer's STRIDE slot, so the
    SE reduction stays 64; SE_TVLayer's conv1/bn are defined but unused.
  * TVBasicBlock's residual comes from the conv1 output (pre-activation).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.reference_stubs import install_reference_stubs

install_reference_stubs()

import operations_m as om  # noqa: E402

from paif_tpu.io.torch_import import Entry, _bn, _conv, _dense, to_flax_variables  # noqa: E402
from paif_tpu.nn.support import (  # noqa: E402
    DownSample,
    EnhanceResidualModule,
    ReLUConvBN,
    ResidualDownSample,
    ResidualUpSample,
    SETVLayer,
    TVBasicBlock,
    UpSample,
)


def torch_state(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def assert_close(got, want, atol=3e-5):
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=atol, rtol=1e-4
    )


def residual_down_entries(fp, tp):
    p = f"{tp}." if tp else ""
    e = _conv(fp + ("top_conv1",), f"{p}top.0")
    e.append(Entry("params", fp + ("top_act1", "alpha"), f"{p}top.1.weight"))
    e += _conv(fp + ("top_conv3",), f"{p}top.2")
    e.append(Entry("params", fp + ("top_act2", "alpha"), f"{p}top.3.weight"))
    e += _conv(fp + ("top_conv_out",), f"{p}top.5")
    e += _conv(fp + ("bot_conv",), f"{p}bot.1")
    return e


def residual_up_entries(fp, tp):
    p = f"{tp}." if tp else ""
    e = _conv(fp + ("top_conv1",), f"{p}top.0")
    e.append(Entry("params", fp + ("top_act1", "alpha"), f"{p}top.1.weight"))
    e.append(
        Entry("params", fp + ("top_deconv", "kernel"), f"{p}top.2.weight", "deconv")
    )
    e.append(Entry("params", fp + ("top_act2", "alpha"), f"{p}top.3.weight"))
    e += _conv(fp + ("top_conv_out",), f"{p}top.4")
    e += _conv(fp + ("bot_conv",), f"{p}bot.1")
    return e


def test_residual_downsample_parity(rng):
    torch.manual_seed(0)
    ref = om.ResidualDownSample(16).eval()
    x = rng.normal(0, 1, (2, 16, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = ResidualDownSample()
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    v = to_flax_variables(torch_state(ref), residual_down_entries((), ""), template=variables)
    assert_close(model.apply(v, nhwc(x)), want)


def test_downsample_stack_parity(rng):
    torch.manual_seed(0)
    ref = om.DownSample(8, scale_factor=4).eval()
    x = rng.normal(0, 1, (1, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = DownSample(scale_factor=4)
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    e = residual_down_entries(("stage0",), "body.0") + residual_down_entries(
        ("stage1",), "body.1"
    )
    v = to_flax_variables(torch_state(ref), e, template=variables)
    assert_close(model.apply(v, nhwc(x)), want)


def test_residual_upsample_parity(rng):
    torch.manual_seed(0)
    ref = om.ResidualUpSample(16).eval()
    x = rng.normal(0, 1, (2, 16, 12, 10)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = ResidualUpSample()
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    v = to_flax_variables(torch_state(ref), residual_up_entries((), ""), template=variables)
    assert_close(model.apply(v, nhwc(x)), want)


def test_upsample_stack_parity(rng):
    torch.manual_seed(0)
    ref = om.UpSample(16, scale_factor=4).eval()
    x = rng.normal(0, 1, (1, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = UpSample(scale_factor=4)
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    e = residual_up_entries(("stage0",), "body.0") + residual_up_entries(("stage1",), "body.1")
    v = to_flax_variables(torch_state(ref), e, template=variables)
    assert_close(model.apply(v, nhwc(x)), want)


def test_se_tv_layer_parity(rng):
    torch.manual_seed(0)
    ref = om.SE_TVLayer(32).eval()
    x = rng.normal(0, 1, (2, 32, 10, 14)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = SETVLayer()
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    e = _dense(("fc1",), "fc.0") + _dense(("fc2",), "fc.2")
    v = to_flax_variables(torch_state(ref), e, template=variables)
    assert_close(model.apply(v, nhwc(x)), want)


def test_tv_basic_block_parity(rng):
    torch.manual_seed(0)
    ref = om.TVBasicBlock(24, 24).eval()
    x = rng.normal(0, 1, (1, 24, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = TVBasicBlock(24)
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    e = _conv(("conv1",), "conv1") + _conv(("conv2",), "conv2")
    e += _dense(("se", "fc1"), "se.fc.0") + _dense(("se", "fc2"), "se.fc.2")
    e.append(Entry("params", ("act", "alpha"), "relu.weight"))
    v = to_flax_variables(torch_state(ref), e, template=variables)
    assert_close(model.apply(v, nhwc(x)), want)


def test_enhance_residual_module_parity(rng):
    torch.manual_seed(0)
    ref = om.EnhanceResidualModule(16).eval()
    x = rng.normal(0, 1, (2, 16, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = EnhanceResidualModule(16)
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    e = _conv(("dw5",), "op.0") + _conv(("dw3",), "op.1") + _conv(("pw",), "op.2")
    e += _bn(("bn",), "op.3")
    e.append(Entry("params", ("act", "alpha"), "op.4.weight"))
    v = to_flax_variables(torch_state(ref), e, template=variables)
    assert_close(model.apply(v, nhwc(x)), want)


def test_relu_conv_bn_parity(rng):
    torch.manual_seed(0)
    ref = om.ReLUConvBN(12, 20, 3, 1, 1).eval()
    x = rng.normal(0, 1, (2, 12, 10, 10)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model = ReLUConvBN(20, 3, padding=1)
    variables = model.init(jax.random.PRNGKey(0), nhwc(x))
    e = _conv(("conv",), "op.1") + _bn(("bn",), "op.2")
    v = to_flax_variables(torch_state(ref), e, template=variables)
    assert_close(model.apply(v, nhwc(x)), want)
