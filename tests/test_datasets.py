"""Dataset + augmentation behavior tests.

MFDataset is value-compared against the reference util/MF_dataset.py on an
MFNet-style 4-channel PNG fixture; augmentations are output-compared against
util/augmentation.py under a scripted RNG; the coupled Meta loader's shared
crop window (incl. the optional seg label) is verified.
"""


import numpy as np
import pytest
from PIL import Image

from paif_tpu.data.datasets import FusionMetaDataset, MFDataset


def _write_mfnet_fixture(tmp_path, rng, n=2, hw=(20, 30)):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    names = [chr(ord("a") + i) for i in range(n)]
    for nm in names:
        # MFNet images are 4-channel PNGs: RGB + thermal in the alpha slot
        img = rng.integers(0, 256, (*hw, 4)).astype(np.uint8)
        Image.fromarray(img, mode="RGBA").save(tmp_path / "images" / f"{nm}.png")
        lab = rng.integers(0, 9, hw).astype(np.uint8)
        Image.fromarray(lab).save(tmp_path / "labels" / f"{nm}.png")
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    return names


def test_mf_dataset(tmp_path, rng):
    names = _write_mfnet_fixture(tmp_path, rng)
    ds = MFDataset(str(tmp_path), "train", input_hw=(16, 24))
    assert len(ds) == len(names)
    vis, ir, lab, name = ds[0]
    assert vis.shape == (16, 24, 3) and ir.shape == (16, 24, 1)
    assert lab.shape == (16, 24) and lab.max() < 9
    assert name == "a"


def test_mf_dataset_matches_reference_loader(tmp_path, rng):
    """Value parity with util/MF_dataset.py on the same 4-channel fixture:
    identical resize kernel, /255 scaling, channel split, label NEAREST."""
    from tests.reference_stubs import install_reference_stubs

    install_reference_stubs()
    from util.MF_dataset import MF_dataset

    _write_mfnet_fixture(tmp_path, rng)
    h, w = 16, 24
    ours = MFDataset(str(tmp_path), "train", input_hw=(h, w))
    ref = MF_dataset(str(tmp_path), "train", input_h=h, input_w=w)

    for i in range(len(ours)):
        vis, ir, lab, name = ours[i]
        r_img, r_lab, r_name = ref[i]
        r_img = r_img.numpy()  # (4, H, W) float /255
        assert name == r_name
        np.testing.assert_allclose(vis.transpose(2, 0, 1), r_img[:3], atol=1e-7)
        np.testing.assert_allclose(ir[..., 0], r_img[3], atol=1e-7)
        np.testing.assert_array_equal(lab, r_lab.numpy())


def test_fusion_meta_dataset(tmp_path, rng):
    dirs = {}
    for sub in ("ir", "vi", "mask", "iro", "viso", "lab"):
        d = tmp_path / sub
        d.mkdir()
        dirs[sub] = str(d)
    # encode the pixel row index into every image so the crop window is
    # recoverable from the item values
    row = np.tile(np.arange(40, dtype=np.uint8)[:, None], (1, 48))
    for i in range(2):
        Image.fromarray(np.stack([row] * 3, -1)).save(tmp_path / "vi" / f"{i}.png")
        Image.fromarray(np.stack([row] * 3, -1)).save(tmp_path / "viso" / f"{i}.png")
        Image.fromarray(row).save(tmp_path / "ir" / f"{i}.png")
        Image.fromarray(row).save(tmp_path / "iro" / f"{i}.png")
        Image.fromarray(row).save(tmp_path / "mask" / f"{i}.png")
        Image.fromarray(row).save(tmp_path / "lab" / f"{i}.png")

    ds = FusionMetaDataset(
        ir_path=dirs["ir"], vi_path=dirs["vi"], mask_path=dirs["mask"],
        ir_orig_path=dirs["iro"], vi_orig_path=dirs["viso"], crop_size=32,
        label_path=dirs["lab"],
    )
    vis, ir, viso, iro, mask, label, name = ds[0]
    assert vis.shape == (32, 32, 3) and viso.shape == (32, 32, 3)
    assert ir.shape == (32, 32, 1) and iro.shape == (32, 32, 1)
    assert mask.shape == (32, 32, 1) and label.shape == (32, 32)
    assert 0.0 <= float(mask.max()) <= 1.0
    # every tensor of the item shares ONE crop window (reference :171-180):
    # the encoded row index must agree across all six tensors
    r0 = label[0, 0]
    assert int(round(float(vis[0, 0, 0]) * 255)) == r0
    assert int(round(float(ir[0, 0, 0]) * 255)) == r0
    assert int(round(float(iro[0, 0, 0]) * 255)) == r0
    assert int(round(float(mask[0, 0, 0]) * 255)) == r0
    # and without a label dir the item is the reference 6-tuple
    ds6 = FusionMetaDataset(
        ir_path=dirs["ir"], vi_path=dirs["vi"], mask_path=dirs["mask"],
        ir_orig_path=dirs["iro"], vi_orig_path=dirs["viso"], crop_size=32,
    )
    assert len(ds6[0]) == 6


class _ScriptedRNG:
    """Feeds one fixed value sequence to BOTH RNG interfaces (legacy
    np.random.* for the reference, np.random.Generator-style for ours)."""

    def __init__(self, values):
        self.values = list(values)

    def _next(self):
        return self.values.pop(0)

    # Generator interface (ours)
    def random(self):
        return self._next()

    def integers(self, low, high=None, size=None):
        v = self._next()
        if size is None:
            return int(v)
        return np.full(size, int(v), dtype=np.int64)

    def uniform(self, low, high, size=None):
        return self._next()


@pytest.mark.parametrize(
    "aug_name,script",
    [
        ("RandomFlip", [0.0]),
        ("RandomCropOut", [0.0, 2, 3]),
        ("RandomBrightness", [0.0, 1.1]),
        ("RandomNoise", [0.0, 3]),
        ("RandomCrop", [0.0, 1, 2, 30, 29]),
    ],
)
def test_augmentation_matches_reference(aug_name, script, monkeypatch, rng):
    """Output parity with util/augmentation.py under a scripted RNG (square
    images: the reference names axes (w,h) swapped but slices consistently)."""
    from tests.reference_stubs import install_reference_stubs

    install_reference_stubs()
    from util import augmentation as ref_aug

    import paif_tpu.data.augmentation as our_aug

    img = rng.integers(0, 256, (32, 32, 3)).astype(np.float32)
    lab = rng.integers(0, 9, (32, 32)).astype(np.int64)

    s_ref = _ScriptedRNG(script)
    monkeypatch.setattr(np.random, "rand", lambda *a: s_ref._next())
    monkeypatch.setattr(
        np.random, "randint", lambda low, high=None, size=None: s_ref.integers(low, high, size)
    )
    monkeypatch.setattr(np.random, "uniform", lambda lo, hi, size=None: s_ref.uniform(lo, hi, size))
    ref_img, ref_lab = getattr(ref_aug, aug_name)()(img.copy(), lab.copy())

    ours_img, ours_lab = getattr(our_aug, aug_name)()(
        img.copy(), lab.copy(), _ScriptedRNG(list(script))
    )
    np.testing.assert_array_equal(np.ascontiguousarray(ours_img), np.ascontiguousarray(ref_img))
    np.testing.assert_array_equal(np.ascontiguousarray(ours_lab), np.ascontiguousarray(ref_lab))


def test_random_crop_bounds_fractional_size(monkeypatch, rng):
    """The high-edge draw's LOW bound truncates the float w0 - w0*rate
    (np.random.randint semantics): at 35x35 rate 0.1 the reference can
    reach r2=31 (int(35-3.5)=31); w0 - int(w0*rate) = 32 would not."""
    from tests.reference_stubs import install_reference_stubs

    install_reference_stubs()
    from util import augmentation as ref_aug

    import paif_tpu.data.augmentation as our_aug

    img = rng.integers(0, 256, (35, 35, 3)).astype(np.float32)
    lab = rng.integers(0, 9, (35, 35)).astype(np.int64)

    # scripted RNG hitting the minimum of every draw
    class _Script:
        def random(self):
            return 0.0

        def integers(self, lo, hi):
            return lo

    seq = iter([0.0])

    def fake_rand():
        return 0.0

    def fake_randint(lo, hi):
        return int(lo)

    monkeypatch.setattr(ref_aug.np.random, "rand", fake_rand)
    monkeypatch.setattr(ref_aug.np.random, "randint", fake_randint)
    r_img, _ = ref_aug.RandomCrop(crop_rate=0.1, prob=1.0)(img.copy(), lab.copy())

    o_img, _ = our_aug.RandomCrop(crop_rate=0.1, prob=1.0)(img.copy(), lab.copy(), _Script())
    assert o_img.shape == r_img.shape


def test_fusion_dataset_tensor_cache(tmp_path, rng):
    """cache_dir: decode-once memmap serves items identical to direct decode
    and survives re-construction (round-5 e2e input-path item)."""
    from PIL import Image

    from paif_tpu.data.datasets import FusionDataset

    for sub in ("ir", "vi", "label"):
        (tmp_path / sub).mkdir()
    for i in range(3):
        vis = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
        ir = rng.integers(0, 256, (32, 40)).astype(np.uint8)
        lab = rng.integers(0, 9, (32, 40)).astype(np.uint8)
        Image.fromarray(vis).save(tmp_path / "vi" / f"{i}.png")
        Image.fromarray(ir).save(tmp_path / "ir" / f"{i}.png")
        Image.fromarray(lab).save(tmp_path / "label" / f"{i}.png")

    kw = dict(
        ir_path=str(tmp_path / "ir"),
        vi_path=str(tmp_path / "vi"),
        label_path=str(tmp_path / "label"),
        uint8=True,
    )
    plain = FusionDataset(**kw)
    cached = FusionDataset(**kw, cache_dir=str(tmp_path / "cache"))
    assert cached.cache is not None
    reread = FusionDataset(**kw, cache_dir=str(tmp_path / "cache"))  # reuse
    for ds in (cached, reread):
        for i in range(3):
            pv, pi, pl, pn = plain[i]
            cv, ci, cl, cn = ds[i]
            assert pn == cn
            np.testing.assert_array_equal(pv, cv)
            np.testing.assert_array_equal(pi, ci)
            np.testing.assert_array_equal(pl, cl)
            assert cv.dtype == ci.dtype == cl.dtype == np.uint8
