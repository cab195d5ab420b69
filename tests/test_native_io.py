"""Native C++ image decoder: build + round-trip parity vs PIL."""

import numpy as np
import pytest
from PIL import Image

from paif_tpu.io import native


@pytest.fixture(scope="module")
def images(tmp_path_factory, rng=None):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    rgb = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    p_rgb = str(d / "rgb.png")
    p_gray = str(d / "gray.png")
    p_jpg = str(d / "img.jpg")
    Image.fromarray(rgb).save(p_rgb)
    Image.fromarray(gray).save(p_gray)
    Image.fromarray(rgb).save(p_jpg, quality=95)
    return p_rgb, p_gray, p_jpg, rgb, gray


def test_native_build_and_decode(images):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    p_rgb, p_gray, p_jpg, rgb, gray = images
    assert native.image_size(p_rgb) == (40, 56, 3)
    assert native.image_size(p_gray) == (40, 56, 1)
    np.testing.assert_array_equal(native.decode_image(p_rgb, 3), rgb)
    np.testing.assert_array_equal(native.decode_image(p_gray, 1), gray[..., None])
    # jpeg is lossy: compare against PIL's decode of the same file
    pil_jpg = np.array(Image.open(p_jpg).convert("RGB"))
    got = native.decode_image(p_jpg, 3)
    assert got.shape == pil_jpg.shape
    assert np.mean(np.abs(got.astype(int) - pil_jpg.astype(int))) < 2.0


def test_native_gray_rgb_conversions(images):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    p_rgb, p_gray, _, rgb, gray = images
    # rgb file decoded as gray: close to ITU luma
    g = native.decode_image(p_rgb, 1)
    assert g.shape == (40, 56, 1)
    # gray file decoded as rgb: replicated channels
    r3 = native.decode_image(p_gray, 3)
    np.testing.assert_array_equal(r3[..., 0], r3[..., 1])


def test_native_batch_decode(images):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    p_rgb, p_gray, p_jpg, rgb, gray = images
    out = native.decode_batch([p_rgb, p_rgb, p_rgb], 40, 56, 3, threads=3)
    assert out.shape == (3, 40, 56, 3)
    np.testing.assert_array_equal(out[0], rgb)
    np.testing.assert_array_equal(out[2], rgb)


def test_dataset_uses_native_path(tmp_path):
    from paif_tpu.data.datasets import FusionDataset
    from paif_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(str(tmp_path), n=2, hw=(32, 32))
    disk = FusionDataset(
        ir_path=str(tmp_path / "Infrared"),
        vi_path=str(tmp_path / "Visible"),
        label_path=str(tmp_path / "Label"),
    )
    vis, ir, label, _ = disk[0]
    # decode path (native or PIL) must reproduce the synthetic data to u8
    np.testing.assert_allclose(vis, np.round(ds[0][0] * 255) / 255.0, atol=1 / 255)
