"""End-to-end: CLI entry points over synthetic fixtures (tiny config),
data pipeline batching/padding, and the multi-device eval path."""

import json
import os

import numpy as np
import pytest

import jax

from paif_tpu.data.pipeline import batch_iterator, pad_to_batch
from paif_tpu.data.synthetic import make_synthetic_dataset

TINY = os.path.join(os.path.dirname(__file__), "..", "paif_tpu", "configs", "tiny_b0.yaml")


def test_pad_to_batch():
    b = {"vis": np.zeros((3, 4, 4, 3)), "name": ["a", "b", "c"]}
    out = pad_to_batch(b, 8)
    assert out["vis"].shape[0] == 8
    assert out["valid"].sum() == 3
    assert len(out["name"]) == 8


def test_batch_iterator_shapes():
    ds = make_synthetic_dataset(n=5, hw=(32, 32))
    batches = list(batch_iterator(ds, 2))
    assert len(batches) == 3
    assert batches[0]["vis"].shape == (2, 32, 32, 3)
    assert batches[-1]["valid"].tolist() == [True, False]


def test_synthetic_roundtrip(tmp_path):
    ds = make_synthetic_dataset(str(tmp_path), n=2, hw=(32, 32))
    from paif_tpu.data.datasets import FusionDataset

    disk = FusionDataset(
        ir_path=str(tmp_path / "Infrared"),
        vi_path=str(tmp_path / "Visible"),
        label_path=str(tmp_path / "Label"),
    )
    assert len(disk) == 2
    vis, ir, label, name = disk[0]
    assert vis.shape == (32, 32, 3) and ir.shape == (32, 32, 1)
    np.testing.assert_array_equal(label, ds[0][2])


def test_clean_eval_cli(tmp_path):
    from paif_tpu.cli.test_original import main

    metrics = main(["--config", TINY, "--save_dir", str(tmp_path)])
    assert 0.0 <= metrics["iou_mean"] <= 1.0
    assert os.path.exists(tmp_path / "fused")
    # report file written in the reference's naming scheme
    assert any(f.endswith(".txt") for f in os.listdir(tmp_path))


def test_robust_eval_cli(tmp_path):
    from paif_tpu.cli.robust_test import main

    metrics = main(["--config", TINY, "--save_dir", str(tmp_path), "--attack_iters", "1"])
    assert 0.0 <= metrics["iou_mean"] <= 1.0
    assert os.path.exists(tmp_path / "ir_attacked")
    assert os.path.exists(tmp_path / "vis_attacked")


def test_eval_runs_on_mesh():
    """Same eval sharded over the 8 virtual devices must give the same
    confusion totals as single-device."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from paif_tpu.cli.common import build_dataset, build_model, build_variables
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.utils.config import load_config

    cfg = load_config(TINY)
    cfg.dataset.batch_size = 8
    model = build_model(cfg)
    ds = build_dataset(cfg)
    variables = build_variables(cfg, model, ds[0][0].shape[:2])
    m_mesh = run_eval(model, variables, ds, EvalConfig(batch_size=8, use_mesh=True))
    m_single = run_eval(model, variables, ds, EvalConfig(batch_size=8, use_mesh=False))
    assert abs(m_mesh["iou_mean"] - m_single["iou_mean"]) < 1e-6


def test_bench_dp_forward_shards_and_matches():
    """bench.py's --dp path, structurally: params replicated, batch sharded
    1/N per device over the mesh, jitted DP forward numerically equal to the
    single-device forward (VERDICT round-1 next #6)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    import jax.numpy as jnp

    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint
    from paif_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    n = len(jax.devices())
    model = PAIFJoint(
        backbone="mit_b0", num_classes=9, fusion=lambda: FusionNetSearched(8, PAIF_GENOTYPE)
    )
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (n * 2, 32, 32, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (n * 2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ir[:1], vis[:1])

    single = jax.jit(model.apply)(variables, ir, vis)

    mesh = make_mesh()
    v_rep = replicate(mesh, variables)
    ir_s, vis_s = shard_batch(mesh, (ir, vis))
    # each device holds exactly batch/N rows
    shards = ir_s.addressable_shards
    assert len(shards) == n
    assert all(s.data.shape[0] == 2 for s in shards)
    dp = jax.jit(model.apply)(v_rep, ir_s, vis_s)
    for a, b in zip(jax.tree_util.tree_leaves(single), jax.tree_util.tree_leaves(dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_bench_smoke(monkeypatch, capsys):
    """bench.py's timing plumbing end to end at tiny shapes: the driver runs
    this script unattended at round end, so a Python error in the (round-3
    rewritten) steady-state slope path must be caught here, off-chip. Also
    exercises the --dp branch (8 virtual devices) and the JSON contract."""
    import sys

    import bench

    monkeypatch.setenv("PAIF_BENCH_SMOKE", "1")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["metric"] == "fused_pairs_per_sec"
    assert data["unit"] == "pairs/s"
    assert data["value"] > 0 and data["vs_baseline"] > 0


def test_train_aat_cli_smoke(tmp_path):
    from paif_tpu.cli.train_aat import main

    state = main(
        [
            "--config",
            TINY,
            "--max_iters",
            "2",
            "--save_every",
            "2",
            "--out",
            str(tmp_path / "ckpt"),
        ]
    )
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "ckpt" / "step_2")


def test_clean_eval_cli_with_torch_checkpoint(tmp_path):
    """The checkpoint-parity runbook command (BASELINE.md): given a torch
    .pth of the joint model (the published checkpoints' format,
    robust_test.py:259-263), the eval CLI ingests it through
    io/torch_import and produces the mIoU report — so the day a real
    checkpoint is available the north-star check is a copy-paste."""
    import torch

    from tests.reference_stubs import install_reference_stubs

    install_reference_stubs()
    from core.model_fusion_auto import Network_MM_Searched

    from paif_tpu.cli.test_original import main
    from paif_tpu.genotype import PAIF_GENOTYPE
    from tests.test_torch_parity import to_ref_genotype

    torch.manual_seed(0)
    ref = Network_MM_Searched(
        8, to_ref_genotype(PAIF_GENOTYPE), None, None, "mit_b0", num_classes=9
    ).eval()
    pth = tmp_path / "joint.pth"
    torch.save(ref.state_dict(), pth)

    metrics = main(
        ["--config", TINY, "--checkpoint", str(pth), "--save_dir", str(tmp_path / "out")]
    )
    assert 0.0 <= metrics["iou_mean"] <= 1.0


def test_train_aat_kill_and_resume(tmp_path):
    """Full train-state resume (VERDICT round-2 missing #3): a run killed at
    step 2 and resumed from its checkpoint must continue with the SAME Adam
    moments and LR schedule as an uninterrupted run — i.e. params, opt_state
    and step all match at step 4. The reference can only resume the LR
    (PolyWarmupAdamW_seg iter_curr, utils/optimizer.py:36-47)."""
    import jax
    import numpy as np

    from paif_tpu.cli.train_aat import main

    common = ["--config", TINY, "--save_every", "2", "--max_iters", "4"]
    straight = main([*common, "--out", str(tmp_path / "a")])
    # "killed" run: same schedule horizon (--max_iters), halted at 2 via
    # --stop_at, then resumed from the saved state
    main([*common, "--stop_at", "2", "--out", str(tmp_path / "b")])
    resumed = main(
        [
            *common,
            "--max_iters",
            "4",
            "--out",
            str(tmp_path / "b"),
            "--resume",
            str(tmp_path / "b" / "step_2"),
        ]
    )
    assert int(resumed.step) == 4
    for name, a, b in (
        ("params", straight.params, resumed.params),
        ("opt_state", straight.opt_state, resumed.opt_state),
    ):
        for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), atol=1e-6, rtol=1e-5, err_msg=name
            )


def test_config_genotype_roundtrip(tmp_path):
    """Genotype literals survive YAML round trip with reference schema keys."""
    import yaml

    from paif_tpu.genotype import PAIF_GENOTYPE, Genotype
    from paif_tpu.utils.config import load_config

    d = PAIF_GENOTYPE.to_dict()
    path = tmp_path / "g.yaml"
    path.write_text(yaml.safe_dump({"model": {"genotype": d}}))
    cfg = load_config(str(path))
    assert cfg.model.genotype == PAIF_GENOTYPE
    assert Genotype.from_dict(d) == PAIF_GENOTYPE


def test_augmentations(rng):
    from paif_tpu.data.augmentation import (
        RandomBrightness,
        RandomCrop,
        RandomCropOut,
        RandomFlip,
        RandomNoise,
    )

    img = (rng.uniform(0, 255, (32, 40, 3))).astype(np.float32)
    lab = rng.integers(0, 9, (32, 40)).astype(np.int64)
    g = np.random.default_rng(0)
    for aug in (RandomFlip(1.0), RandomCropOut(prob=1.0), RandomBrightness(prob=1.0), RandomNoise(prob=1.0)):
        i2, l2 = aug(img.copy(), lab.copy(), g)
        assert i2.shape[2] == 3
    i3, l3 = RandomCrop(prob=1.0)(img, lab, g)
    assert i3.shape[0] <= 32 and i3.shape[:2] == l3.shape


def test_robust_cli_modes_and_bf16(tmp_path):
    """Attack mode 'ir' + segPGD way through the CLI; bf16 dtype path runs."""
    from paif_tpu.cli.robust_test import main

    m = main(
        [
            "--config", TINY, "--attack_iters", "1",
            "--attack_mode", "ir", "--attack_way", "segPGD",
        ]
    )
    assert 0.0 <= m["iou_mean"] <= 1.0

    import yaml

    from paif_tpu.utils.config import load_config

    cfg_path = tmp_path / "bf16.yaml"
    base = yaml.safe_load(open(TINY))
    base["dtype"] = "bfloat16"
    cfg_path.write_text(yaml.safe_dump(base))
    cfg = load_config(str(cfg_path))
    assert cfg.dtype == "bfloat16"
    from paif_tpu.cli.test_original import main as clean_main

    m2 = clean_main(["--config", str(cfg_path)])
    assert np.isfinite(m2["iou_mean"])


def test_search_cli(tmp_path):
    """DARTS search CLI end to end: bilevel steps on synthetic pairs, derived
    genotype JSON round-trips through the Genotype schema."""
    import json

    from paif_tpu.cli.search import main
    from paif_tpu.genotype import Genotype
    from paif_tpu.nn.ops_registry import parse_op_string

    out = tmp_path / "geno.json"
    rc = main(
        ["--synthetic", "--steps", "3", "--batch_size", "2", "--crop", "32",
         "--channels", "8", "--out", str(out)]
    )
    assert rc == 0
    g = Genotype.from_dict(json.load(open(out)))
    for chain in ("normal_1", "normal_2", "normal_3"):
        for op in g.ops(chain):
            parse_op_string(op)  # every derived op is a valid primitive


def test_search_cli_perception_aware(tmp_path):
    """Perception-aware bilevel search (--seg_weight): the val objective that
    drives the alphas carries a jointly-trained seg-probe CE term (the
    reference's coupled 0.1*fusion + 4*seg surface,
    model_fusion_auto.py:1093-1100). End to end: genotype JSON derives."""
    import json

    from paif_tpu.cli.search import main
    from paif_tpu.genotype import Genotype
    from paif_tpu.nn.ops_registry import parse_op_string

    out = tmp_path / "geno_pa.json"
    rc = main(
        ["--synthetic", "--steps", "2", "--batch_size", "2", "--crop", "32",
         "--channels", "8", "--seg_weight", "4.0", "--out", str(out)]
    )
    assert rc == 0
    g = Genotype.from_dict(json.load(open(out)))
    for chain in ("normal_1", "normal_2", "normal_3"):
        for op in g.ops(chain):
            parse_op_string(op)


def test_robust_cli_fused_diff_boxes(tmp_path, monkeypatch):
    """Round-3 fused Pallas GF boxes, primal AND differentiated (the
    PAIF_PALLAS_BOX_DIFF attack-graph knob), through the full robust CLI at
    a packed-applicable width (fusion_channels 32 -> 128 packed lanes) —
    keeps the opt-in path green off-chip (interpret mode)."""
    from paif_tpu.cli.robust_test import main

    cfgp = tmp_path / "tiny32.yaml"
    cfgp.write_text(
        "model:\n  backbone: mit_b0\n  num_classes: 9\n  fusion_channels: 32\n"
        "dataset:\n  batch_size: 2\n  image_hw: [64, 64]\n"
        "  synthetic: true\n  synthetic_n: 2\n"
    )
    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    monkeypatch.setenv("PAIF_FUSED_GF_BOX", "1")
    monkeypatch.setenv("PAIF_PALLAS_BOX_DIFF", "1")
    metrics = main(
        ["--config", str(cfgp), "--save_dir", str(tmp_path), "--attack_iters", "1"]
    )
    assert 0.0 <= metrics["iou_mean"] <= 1.0


def test_all_config_presets_load():
    """Every shipped YAML preset round-trips through the config schema
    (the reference ships 5 configs: voc / voc_fusion / voc_fusionrm /
    voc_methods / vocnas — mapped to mfnet_b3 / fusion_train_b3 /
    fusion_train_rm_b3 / methods_b3 / search_b0; tiny_b0 is the CI
    smoke preset)."""
    import glob

    from paif_tpu.utils.config import load_config

    presets = sorted(glob.glob(os.path.join(os.path.dirname(TINY), "*.yaml")))
    assert len(presets) >= 6
    for p in presets:
        cfg = load_config(p)
        assert cfg.model.backbone.startswith("mit_b")
        assert cfg.dataset.batch_size >= 1 and cfg.train.max_iters >= 1


def test_uint8_host_path_matches_f32(tmp_path):
    """The uint8 host pipeline (decode-domain uint8 + device-side /255,
    round-4 e2e-throughput work) must produce the SAME eval metrics as the
    legacy host-f32 pipeline: the device normalize is f32 /255 before the
    working-dtype cast, bit-identical to the host conversion."""
    from paif_tpu.cli.common import build_model, build_variables
    from paif_tpu.data.datasets import FusionDataset
    from paif_tpu.data.synthetic import make_synthetic_dataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.utils.config import load_config

    make_synthetic_dataset(str(tmp_path), n=4, hw=(32, 32))
    kw = dict(
        ir_path=str(tmp_path / "Infrared"),
        vi_path=str(tmp_path / "Visible"),
        label_path=str(tmp_path / "Label"),
    )
    ds_u8 = FusionDataset(uint8=True, **kw)
    ds_f32 = FusionDataset(uint8=False, **kw)
    vis, ir, label, _ = ds_u8[0]
    assert vis.dtype == np.uint8 and ir.dtype == np.uint8 and label.dtype == np.uint8
    np.testing.assert_array_equal(vis.astype(np.float32) / 255.0, ds_f32[0][0])

    cfg = load_config(TINY)
    model = build_model(cfg)
    variables = build_variables(cfg, model, vis.shape[:2])
    ecfg = EvalConfig(batch_size=2, use_mesh=False)
    m_u8 = run_eval(model, variables, ds_u8, ecfg)
    m_f32 = run_eval(model, variables, ds_f32, ecfg)
    assert m_u8["iou_mean"] == m_f32["iou_mean"]


def test_eval_input_path_knob_parity(tmp_path, monkeypatch):
    """Every input-path variant (combined single-buffer H2D, device_put in
    the loader thread, decode-once tensor cache) must produce identical
    eval metrics to the default uint8 path — they are transport changes,
    not numeric ones (round-5 e2e A/B, scripts/bench_eval_e2e_ab.py)."""
    from paif_tpu.cli.common import build_model, build_variables
    from paif_tpu.data.datasets import FusionDataset
    from paif_tpu.data.synthetic import make_synthetic_dataset
    from paif_tpu.eval.harness import EvalConfig, run_eval
    from paif_tpu.utils.config import load_config

    make_synthetic_dataset(str(tmp_path), n=4, hw=(32, 32))
    kw = dict(
        ir_path=str(tmp_path / "Infrared"),
        vi_path=str(tmp_path / "Visible"),
        label_path=str(tmp_path / "Label"),
    )
    ds_u8 = FusionDataset(uint8=True, **kw)
    ds_cache = FusionDataset(uint8=True, cache_dir=str(tmp_path / "cache"), **kw)
    assert ds_cache.cache is not None

    cfg = load_config(TINY)
    model = build_model(cfg)
    variables = build_variables(cfg, model, ds_u8[0][0].shape[:2])
    ecfg = EvalConfig(batch_size=2, use_mesh=False)

    for k in ("PAIF_COMBINED_H2D", "PAIF_PUT_IN_LOADER"):
        monkeypatch.delenv(k, raising=False)
    base = run_eval(model, variables, ds_u8, ecfg)
    variants = {
        "combined": {"PAIF_COMBINED_H2D": "1"},
        "loader_put": {"PAIF_PUT_IN_LOADER": "1"},
        "both": {"PAIF_COMBINED_H2D": "1", "PAIF_PUT_IN_LOADER": "1"},
    }
    for name, env in variants.items():
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        m = run_eval(model, variables, ds_u8, ecfg)
        assert m["iou_mean"] == base["iou_mean"], name
        for k in env:
            monkeypatch.delenv(k)
    m_cache = run_eval(model, variables, ds_cache, ecfg)
    assert m_cache["iou_mean"] == base["iou_mean"]
