"""Golden tests for the numerics substrate against PyTorch (CPU) semantics.

torch here defines *reference semantics only* — the framework itself never
imports it. Tolerances are float32-level.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from paif_tpu.ops import (
    box_filter,
    clip01,
    cross_entropy_ignore,
    guided_filter,
    imagenet_normalize,
    minmax_normalize,
    patch_entropy,
    resize_bilinear,
    rgb_to_ycrcb,
    sobel_xy,
    ssim,
    ycrcb_to_rgb,
)

B, H, W = 2, 24, 32


def nhwc(t: torch.Tensor) -> np.ndarray:
    return t.permute(0, 2, 3, 1).numpy()


def test_ycrcb_round_trip(rng):
    x = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    y = rgb_to_ycrcb(jnp.asarray(x))
    back = ycrcb_to_rgb(y)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-3)
    # explicit formula check
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    ref_y = 0.299 * r + 0.587 * g + 0.114 * b
    np.testing.assert_allclose(np.asarray(y[..., 0]), ref_y, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[..., 1]), (r - ref_y) * 0.713 + 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[..., 2]), (b - ref_y) * 0.564 + 0.5, atol=1e-6)


def test_clip_and_minmax(rng):
    x = rng.normal(0, 1, (B, H, W, 3)).astype(np.float32)
    c = np.asarray(clip01(jnp.asarray(x)))
    assert c.min() >= 0 and c.max() <= 1
    n = np.asarray(minmax_normalize(jnp.asarray(x)))
    for i in range(B):
        assert abs(n[i].min()) < 1e-6 and abs(n[i].max() - 1) < 1e-5


def test_imagenet_normalize(rng):
    x = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    out = np.asarray(imagenet_normalize(jnp.asarray(x)))
    mean = np.array([123.675, 116.28, 103.53], dtype=np.float32)
    std = np.array([58.395, 57.12, 57.375], dtype=np.float32)
    np.testing.assert_allclose(out, (x * 255 - mean) / std, rtol=1e-5, atol=1e-4)


def test_sobel_matches_torch(rng):
    x = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    kx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]).view(1, 1, 3, 3)
    ky = torch.tensor([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]]).view(1, 1, 3, 3)
    t = torch.from_numpy(x)
    ref = (F.conv2d(t, kx, padding=1).abs() + F.conv2d(t, ky, padding=1).abs()).numpy()
    got = np.asarray(sobel_xy(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got[..., 0], ref[:, 0], atol=1e-5)


def _torch_ssim(img1: torch.Tensor, img2: torch.Tensor, window_size=11):
    # reference formula from pytorch_ssim/__init__.py
    import math

    gauss = torch.tensor(
        [math.exp(-((i - window_size // 2) ** 2) / (2 * 1.5**2)) for i in range(window_size)]
    )
    gauss = (gauss / gauss.sum()).unsqueeze(1)
    win = gauss.mm(gauss.t()).unsqueeze(0).unsqueeze(0)
    c = img1.shape[1]
    win = win.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, win, padding=pad, groups=c)
    mu2 = F.conv2d(img2, win, padding=pad, groups=c)
    s1 = F.conv2d(img1 * img1, win, padding=pad, groups=c) - mu1**2
    s2 = F.conv2d(img2 * img2, win, padding=pad, groups=c) - mu2**2
    s12 = F.conv2d(img1 * img2, win, padding=pad, groups=c) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    return m.mean().item()


def test_ssim_matches_reference_formula(rng):
    a = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ref = _torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    got = float(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)), jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert abs(ref - got) < 1e-5


def _np_box_filter(x: np.ndarray, r: int) -> np.ndarray:
    """Direct O(HW r^2) clamped-window box sum for verification (NHWC)."""
    b, h, w, c = x.shape
    out = np.zeros_like(x)
    for i in range(h):
        for j in range(w):
            i0, i1 = max(0, i - r), min(h, i + r + 1)
            j0, j1 = max(0, j - r), min(w, j + r + 1)
            out[:, i, j, :] = x[:, i0:i1, j0:j1, :].sum(axis=(1, 2))
    return out


def test_box_filter(rng):
    x = rng.uniform(0, 1, (1, 16, 20, 3)).astype(np.float32)
    for r in (1, 4):
        ref = _np_box_filter(x, r)
        got = np.asarray(box_filter(jnp.asarray(x), r))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_guided_filter_identity_limit(rng):
    # eps -> 0 with a self-guide: output ~= input (edge-preserving identity)
    x = rng.uniform(0, 1, (1, 20, 24, 1)).astype(np.float32)
    out = np.asarray(guided_filter(jnp.asarray(x), jnp.asarray(x), r=2, eps=1e-8))
    np.testing.assert_allclose(out, x, atol=1e-2)


def test_guided_filter_vs_numpy(rng):
    # full formula cross-check against a direct numpy implementation
    g = rng.uniform(0, 1, (1, 18, 22, 1)).astype(np.float64)
    s = rng.uniform(0, 1, (1, 18, 22, 3)).astype(np.float64)
    r, eps = 4, 1e-3
    n = _np_box_filter(np.ones_like(g), r)
    mg = _np_box_filter(g, r) / n
    ms = _np_box_filter(s, r) / np.repeat(n, 3, axis=3)
    cov = _np_box_filter(g * s, r) / np.repeat(n, 3, axis=3) - mg * ms
    var = _np_box_filter(g * g, r) / n - mg * mg
    a = cov / (var + eps)
    bb = ms - a * mg
    ref = _np_box_filter(a, r) / np.repeat(n, 3, axis=3) * g + _np_box_filter(bb, r) / np.repeat(n, 3, axis=3)
    got = np.asarray(guided_filter(jnp.asarray(g, dtype=jnp.float32), jnp.asarray(s, dtype=jnp.float32), r, eps))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_patch_entropy_matches_reference_formula(rng):
    x = rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32)
    # direct reference computation (core/Entropy.py semantics)
    psize, nbins, sigma = 4, 32, 0.01
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    unfolded = F.unfold(t, kernel_size=psize, stride=psize)  # (B, p*p, L)
    unfolded = unfolded.transpose(1, 2).reshape(-1, psize * psize)
    bins = torch.linspace(0, 1, nbins)
    resid = unfolded.unsqueeze(2) - bins.view(1, 1, -1)
    kern = torch.exp(-0.5 * (resid / sigma) ** 2)
    pdf = kern.mean(dim=1)
    pdf = pdf / (pdf.sum(dim=1, keepdim=True) + 1e-40) + 1e-40
    ref = float((-(pdf * pdf.log()).sum(dim=1)).sum())
    got = float(patch_entropy(jnp.asarray(x), psize, nbins, sigma))
    assert abs(ref - got) / abs(ref) < 1e-4


@pytest.mark.parametrize("out_hw", [(48, 64), (12, 16), (17, 23), (24, 32)])
@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_matches_torch(rng, out_hw, align):
    x = rng.uniform(0, 1, (B, 5, H, W)).astype(np.float32)
    t = torch.from_numpy(x)
    ref = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=align).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw, align))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_cross_entropy_ignore_matches_torch(rng):
    logits = rng.normal(0, 2, (B, 9, H, W)).astype(np.float32)
    labels = rng.integers(0, 9, (B, H, W)).astype(np.int64)
    labels[0, :4, :4] = 255  # ignored region
    ref = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), ignore_index=255
    ).item()
    got = float(
        cross_entropy_ignore(jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels))
    )
    assert abs(ref - got) < 1e-5
