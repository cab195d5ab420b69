"""EGFNet output parity vs the reference's ACTIVE forward path (large parts
of the upstream file are commented out; modules the forward never touches
are not mapped)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from tests.reference_stubs import install_reference_stubs
from tests.test_gmnet_parity import _install_torchvision_stub
from tests.test_lasnet_parity import _install_resnet_stub

install_reference_stubs()
_install_torchvision_stub()
_install_resnet_stub()


def test_egfnet_parity(rng):
    from core.EGFNet import EGFNet as RefEGFNet

    from paif_tpu.models.zoo.seg_zoo import EGFNet

    torch.manual_seed(0)
    ref = RefEGFNet(9).eval()

    depth = rng.uniform(0, 1, (1, 1, 64, 64)).astype(np.float32)
    rgb = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(depth), torch.from_numpy(rgb)).numpy()

    model = EGFNet(n_classes=9)
    jd = jnp.asarray(depth.transpose(0, 2, 3, 1))
    jr = jnp.asarray(rgb.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jd, jr)
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"]))
    sd = ref.state_dict()

    def conv(fpath, tkey, bias=True):
        params[fpath + ("kernel",)] = jnp.asarray(
            np.transpose(sd[f"{tkey}.weight"].numpy(), (2, 3, 1, 0))
        )
        if bias:
            params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())

    def bn(fpath, tkey):
        params[fpath + ("scale",)] = jnp.asarray(sd[f"{tkey}.weight"].numpy())
        params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())
        stats[fpath + ("mean",)] = jnp.asarray(sd[f"{tkey}.running_mean"].numpy())
        stats[fpath + ("var",)] = jnp.asarray(sd[f"{tkey}.running_var"].numpy())

    conv(("backbone", "conv1"), "layer1_rgb.0", bias=False)
    bn(("backbone", "bn1"), "layer1_rgb.1")
    stage_tkeys = ["layer2_rgb.1", "layer3_rgb", "layer4_rgb", "layer5_rgb"]
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            f = ("backbone", f"layer{stage + 1}_{b}")
            t = f"{stage_tkeys[stage]}.{b}"
            for i in (1, 2, 3):
                conv(f + (f"conv{i}",), f"{t}.conv{i}", bias=False)
                bn(f + (f"bn{i}",), f"{t}.bn{i}")
            if b == 0:
                conv(f + ("ds_conv",), f"{t}.downsample.0", bias=False)
                bn(f + ("ds_bn",), f"{t}.downsample.1")

    for i in range(1, 5):
        conv((f"rgbconv{i}",), f"rgbconv{i}")

    for em in ("em1", "em2", "em3"):
        conv((em, "conv0"), f"{em}.conv0")
        conv((em, "rconv", "conv"), f"{em}.rconv.0")
        bn((em, "rconv", "bn"), f"{em}.rconv.1")
        conv((em, "rrconv"), f"{em}.rrconv")
        bn((em, "rrbn"), f"{em}.rrbn")
        for d in (1, 2, 3, 4):
            conv((em, f"conv{d}"), f"{em}.conv{d}")
        conv((em, "conv"), f"{em}.conv")
        conv((em, "convs", "conv"), f"{em}.convs.0")
        bn((em, "convs", "bn"), f"{em}.convs.1")

    conv(("finalconv",), "finalconv")

    got = model.apply(
        {"params": unflatten_dict(params), "batch_stats": unflatten_dict(stats)}, jd, jr
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-3
    )
