"""Torch parity for self-contained zoo models (SDNet, U2Fusion): weights are
transferred with small in-test key maps (the zoo has no published checkpoints,
so these anchor structural fidelity rather than a .pth ingestion path)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from tests.reference_stubs import install_reference_stubs

install_reference_stubs()

from paif_tpu.models.zoo.fusion_zoo import SDNet, U2Fusion  # noqa: E402


def _conv_w(t):
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def test_sdnet_parity(rng):
    import importlib

    sdnet_mod = importlib.import_module("fusion_model.SDNet")
    torch.manual_seed(0)
    ref = sdnet_mod.SDNet().eval()

    ir = rng.uniform(0, 1, (2, 1, 24, 32)).astype(np.float32)
    vis = rng.uniform(0, 1, (2, 1, 24, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(ir), torch.from_numpy(vis)).numpy()

    model = SDNet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ir.transpose(0, 2, 3, 1)), jnp.asarray(vis.transpose(0, 2, 3, 1))
    )
    sd = ref.state_dict()
    flat = dict(flatten_dict(variables["params"]))
    # my stack(x1,"1") consumes the reference's x1 stream (conv11..conv41) and
    # stack(x2,"2") the conv12..conv42 stream; names align 1:1
    for name in ("conv11", "conv12", "conv21", "conv22", "conv31", "conv32", "conv41", "conv42", "fuse"):
        flat[(name, "kernel")] = jnp.asarray(_conv_w(sd[f"{name}.0.weight"]))
        flat[(name, "bias")] = jnp.asarray(sd[f"{name}.0.bias"].numpy())
    got = model.apply(
        {"params": unflatten_dict(flat)},
        jnp.asarray(ir.transpose(0, 2, 3, 1)),
        jnp.asarray(vis.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got)[..., 0], want[:, 0], atol=2e-5, rtol=1e-4)


def test_u2fusion_parity(rng):
    import importlib

    u2_mod = importlib.import_module("fusion_model.U2Fusion")
    torch.manual_seed(0)
    ref = u2_mod.U2Fusion().eval()

    a = rng.uniform(0, 1, (1, 1, 20, 28)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 1, 20, 28)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(a), torch.from_numpy(b)).numpy()

    model = U2Fusion()
    ja = jnp.asarray(a.transpose(0, 2, 3, 1))
    jb = jnp.asarray(b.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), ja, jb)
    sd = ref.state_dict()
    flat = dict(flatten_dict(variables["params"]))
    mapping = {
        ("conv_1", ): "conv_1.0",
        ("sub0", ): "sub.0.0",
        ("sub1", ): "sub.1.0",
        ("sub2", ): "sub.2.0",
        ("out", ): "sub.3",
    }
    for i in range(5):
        mapping[(f"dense{i}",)] = f"dense_layers.{i}.conv.0"
    for fkey, tkey in mapping.items():
        flat[fkey + ("kernel",)] = jnp.asarray(_conv_w(sd[f"{tkey}.weight"]))
        flat[fkey + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())
    got = model.apply({"params": unflatten_dict(flat)}, ja, jb)
    np.testing.assert_allclose(np.asarray(got)[..., 0], want[:, 0], atol=2e-5, rtol=1e-4)


def test_seafusion_parity(rng):
    import importlib

    sea_mod = importlib.import_module("fusion_model.SeaFusion")
    torch.manual_seed(0)
    ref = sea_mod.SeaFusion().eval()

    vis = rng.uniform(0, 1, (1, 1, 24, 32)).astype(np.float32)
    ir = rng.uniform(0, 1, (1, 1, 24, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(vis), torch.from_numpy(ir)).numpy()

    from paif_tpu.models.zoo.fusion_zoo import SeaFusion

    model = SeaFusion()
    jir = jnp.asarray(ir.transpose(0, 2, 3, 1))
    jvis = jnp.asarray(vis.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jir, jvis)
    sd = ref.state_dict()
    flat = dict(flatten_dict(variables["params"]))

    def put(fkey, tkey, bias=True):
        flat[tuple(fkey.split("/")) + ("kernel",)] = jnp.asarray(_conv_w(sd[f"{tkey}.weight"]))
        if bias:
            flat[tuple(fkey.split("/")) + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())

    put("vis_conv", "vis_conv.conv")
    put("inf_conv", "inf_conv.conv")
    for side in ("vis", "inf"):
        for i in (1, 2):
            base = f"{side}_rgbd{i}"
            put(f"{base}/dense_conv1", f"{base}.dense.conv1.conv")
            put(f"{base}/dense_conv2", f"{base}.dense.conv2.conv")
            put(f"{base}/convdown", f"{base}.convdown.conv")
            put(f"{base}/convup", f"{base}.convup.conv")
            put(f"{base}/sobel_x", f"{base}.sobelconv.convx", bias=False)
            put(f"{base}/sobel_y", f"{base}.sobelconv.convy", bias=False)
    for d in (4, 3, 2, 1):
        put(f"decode{d}", f"decode{d}.conv")
    got = model.apply({"params": unflatten_dict(flat)}, jir, jvis)
    np.testing.assert_allclose(np.asarray(got)[..., 0], want[:, 0], atol=2e-5, rtol=1e-4)


def test_reconet_parity(rng):
    import importlib

    rec_mod = importlib.import_module("fusion_model.Reconet")
    torch.manual_seed(0)
    ref = rec_mod.ReCoNet(depth=2, dim=16, use_bn=False).eval()

    i1 = rng.uniform(0, 1, (1, 1, 24, 32)).astype(np.float32)
    i2 = rng.uniform(0, 1, (1, 1, 24, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(i1), torch.from_numpy(i2)).numpy()

    from paif_tpu.models.zoo.fusion_zoo import ReCoNet

    model = ReCoNet(depth=2, dim=16, use_bn=False)
    ja = jnp.asarray(i1.transpose(0, 2, 3, 1))
    jb = jnp.asarray(i2.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), ja, jb)
    sd = ref.state_dict()
    flat = dict(flatten_dict(variables["params"]))
    flat[("att_a_conv", "kernel")] = jnp.asarray(_conv_w(sd["att_a_conv.weight"]))
    flat[("att_b_conv", "kernel")] = jnp.asarray(_conv_w(sd["att_b_conv.weight"]))
    for d in range(3):
        flat[(f"dgroup_d{d}", "kernel")] = jnp.asarray(_conv_w(sd[f"decoder.conv_d.{d}.group.0.weight"]))
        flat[(f"dgroup_d{d}", "bias")] = jnp.asarray(sd[f"decoder.conv_d.{d}.group.0.bias"].numpy())
    flat[("dgroup_s", "kernel")] = jnp.asarray(_conv_w(sd["decoder.conv_s.0.weight"]))
    flat[("dgroup_s", "bias")] = jnp.asarray(sd["decoder.conv_s.0.bias"].numpy())
    got = model.apply({"params": unflatten_dict(flat)}, ja, jb)
    np.testing.assert_allclose(np.asarray(got)[..., 0], want[:, 0], atol=5e-5, rtol=1e-3)


def test_did_auif_parity(rng):
    import importlib

    auif_mod = importlib.import_module("fusion_model.AUIF")
    torch.manual_seed(0)
    ref = auif_mod.DID().eval()

    a = rng.uniform(0, 1, (1, 1, 24, 32)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 1, 24, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(a), torch.from_numpy(b)).numpy()

    from paif_tpu.models.zoo.fusion_zoo import DID

    model = DID()
    ja = jnp.asarray(a.transpose(0, 2, 3, 1))
    jb = jnp.asarray(b.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), ja, jb)
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"]))
    sd = ref.state_dict()

    def put(fname, tbase, conv_idx, bn_idx, prelu_idx=None):
        params[(f"{fname}_conv", "kernel")] = jnp.asarray(_conv_w(sd[f"{tbase}.{conv_idx}.weight"]))
        params[(f"{fname}_conv", "bias")] = jnp.asarray(sd[f"{tbase}.{conv_idx}.bias"].numpy())
        params[(f"{fname}_bn", "scale")] = jnp.asarray(sd[f"{tbase}.{bn_idx}.weight"].numpy())
        params[(f"{fname}_bn", "bias")] = jnp.asarray(sd[f"{tbase}.{bn_idx}.bias"].numpy())
        stats[(f"{fname}_bn", "mean")] = jnp.asarray(sd[f"{tbase}.{bn_idx}.running_mean"].numpy())
        stats[(f"{fname}_bn", "var")] = jnp.asarray(sd[f"{tbase}.{bn_idx}.running_var"].numpy())
        if prelu_idx is not None:
            params[(f"{fname}_act", "alpha")] = jnp.asarray(sd[f"{tbase}.{prelu_idx}.weight"].numpy())

    for enc, tenc in (("enc1", "AE_Encoder1"), ("enc2", "AE_Encoder2")):
        put(f"{enc}_cov1", f"{tenc}.cov1.cov1", 1, 2, 3)  # reflection pad at 0
        put(f"{enc}_cov2", f"{tenc}.cov2.cov2", 0, 1, 2)
        put(f"{enc}_cov3", f"{tenc}.cov3.cov3", 0, 1)  # tanh
        put(f"{enc}_cov4", f"{tenc}.cov4.cov4", 0, 1)
    put("dec_cov5", "AE_Decoder1.cov5.cov5", 0, 1, 2)
    put("dec_cov6", "AE_Decoder1.cov6.cov6", 0, 1, 2)
    put("dec_cov7", "AE_Decoder1.cov7.cov7", 1, 2)  # pad at 0, sigmoid

    got = model.apply(
        {"params": unflatten_dict(params), "batch_stats": unflatten_dict(stats)}, ja, jb
    )
    np.testing.assert_allclose(np.asarray(got)[..., 0], want[:, 0], atol=5e-5, rtol=1e-3)


def test_bffr_parity(rng):
    import importlib

    bf_mod = importlib.import_module("fusion_model.BFFusion")
    torch.manual_seed(0)
    ref = bf_mod.BFFR().eval()

    vis_y = rng.uniform(0, 1, (1, 1, 32, 48)).astype(np.float32)
    ir = rng.uniform(0, 1, (1, 1, 32, 48)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(vis_y), torch.from_numpy(ir)).numpy()

    from paif_tpu.models.zoo.bffusion import BFFR

    model = BFFR()
    ja = jnp.asarray(ir.transpose(0, 2, 3, 1))
    jb = jnp.asarray(vis_y.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), ja, jb)
    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"]))
    sd = ref.state_dict()

    def conv(fpath, tkey, bias=True):
        params[fpath + ("kernel",)] = jnp.asarray(_conv_w(sd[f"{tkey}.weight"]))
        if bias:
            params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())

    def dense(fpath, tkey, bias=True):
        params[fpath + ("kernel",)] = jnp.asarray(sd[f"{tkey}.weight"].numpy().T)
        if bias:
            params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())

    def bn(fpath, tkey):
        params[fpath + ("scale",)] = jnp.asarray(sd[f"{tkey}.weight"].numpy())
        params[fpath + ("bias",)] = jnp.asarray(sd[f"{tkey}.bias"].numpy())
        stats[fpath + ("mean",)] = jnp.asarray(sd[f"{tkey}.running_mean"].numpy())
        stats[fpath + ("var",)] = jnp.asarray(sd[f"{tkey}.running_var"].numpy())

    for tag in ("vi", "ir"):
        conv((f"conv1_{tag}", "conv"), f"conv1_{tag}.conv2d")
        for i in range(1, 5):
            base = (f"DB{i}_{tag}",)
            conv(base + ("conv1",), f"DB{i}_{tag}.conv1.conv")
            conv(base + ("conv2",), f"DB{i}_{tag}.conv2.conv")
            conv(base + ("conv_down",), f"DB{i}_{tag}.conv_down")
    for i in range(1, 5):
        for attn in ("attn1", "attn2"):
            fb = (f"fusion_block{i}", attn)
            tb = f"fusion_block{i}.{attn}"
            conv(fb + ("pre0",), f"{tb}.conv_pre.0.conv2d")
            bn(fb + ("pre0_bn",), f"{tb}.conv_pre.0.batch_norm")
            conv(fb + ("pre1",), f"{tb}.conv_pre.1.conv2d")
            bn(fb + ("pre1_bn",), f"{tb}.conv_pre.1.batch_norm")
            conv(fb + ("ffn0",), f"{tb}.ffn.0.conv2d")
            bn(fb + ("ffn0_bn",), f"{tb}.ffn.0.batch_norm")
            conv(fb + ("ffn1",), f"{tb}.ffn.1.conv2d")
            bn(fb + ("ffn1_bn",), f"{tb}.ffn.1.batch_norm")
            dense(fb + ("wq1",), f"{tb}.wq1", bias=False)
            dense(fb + ("wk1",), f"{tb}.wk1", bias=False)
            dense(fb + ("wv1",), f"{tb}.wv1", bias=False)
            dense(fb + ("end_proj1",), f"{tb}.end_proj1")
            params[fb + ("norm1", "scale")] = jnp.asarray(sd[f"{tb}.norm1.weight"].numpy())
            params[fb + ("norm1", "bias")] = jnp.asarray(sd[f"{tb}.norm1.bias"].numpy())
    for name in ("DB1_1", "DB2_1", "DB3_1", "DB1_2", "DB2_2", "DB1_3"):
        conv((name, "conv"), f"{name}.conv2d")
    conv(("conv_out",), "conv_out.conv2d")

    got = model.apply(
        {"params": unflatten_dict(params), "batch_stats": unflatten_dict(stats)}, ja, jb
    )
    np.testing.assert_allclose(np.asarray(got)[..., 0], want[:, 0], atol=1e-4, rtol=1e-3)
