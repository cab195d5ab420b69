"""Dataset tests: MFNet split-file layout and the coupled Meta loader."""

import numpy as np
from PIL import Image

from paif_tpu.data.datasets import FusionMetaDataset, MFDataset


def test_mf_dataset(tmp_path, rng):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    names = ["a", "b"]
    for n in names:
        # MFNet images are 4-channel: RGB + thermal
        img = rng.integers(0, 256, (20, 30, 4)).astype(np.uint8)
        Image.fromarray(img, mode="RGBA").save(tmp_path / "images" / f"{n}.png")
        lab = rng.integers(0, 9, (20, 30)).astype(np.uint8)
        Image.fromarray(lab).save(tmp_path / "labels" / f"{n}.png")
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")

    ds = MFDataset(str(tmp_path), "train", input_hw=(16, 24))
    assert len(ds) == 2
    vis, ir, lab, name = ds[0]
    assert vis.shape == (16, 24, 3) and ir.shape == (16, 24, 1)
    assert lab.shape == (16, 24) and lab.max() < 9
    assert name == "a"


def test_fusion_meta_dataset(tmp_path, rng):
    dirs = {}
    for sub in ("ir", "vi", "mask", "iro", "viso"):
        d = tmp_path / sub
        d.mkdir()
        dirs[sub] = str(d)
    for i in range(2):
        rgb = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
        gray = rng.integers(0, 256, (40, 48)).astype(np.uint8)
        Image.fromarray(rgb).save(tmp_path / "vi" / f"{i}.png")
        Image.fromarray(rgb).save(tmp_path / "viso" / f"{i}.png")
        Image.fromarray(gray).save(tmp_path / "ir" / f"{i}.png")
        Image.fromarray(gray).save(tmp_path / "iro" / f"{i}.png")
        Image.fromarray(gray).save(tmp_path / "mask" / f"{i}.png")

    ds = FusionMetaDataset(
        ir_path=dirs["ir"], vi_path=dirs["vi"], mask_path=dirs["mask"],
        ir_orig_path=dirs["iro"], vi_orig_path=dirs["viso"], crop_size=32,
    )
    vis, ir, viso, iro, mask, name = ds[0]
    assert vis.shape == (32, 32, 3) and viso.shape == (32, 32, 3)
    assert ir.shape == (32, 32, 1) and iro.shape == (32, 32, 1)
    assert mask.shape == (32, 32, 1)
    assert 0.0 <= float(mask.max()) <= 1.0
