"""Stubs that let the reference PyTorch code (/root/reference) import on CPU
for golden parity testing. The reference depends on packages not present here
(antialias, guided_filter_pytorch, mmcv, timm, lpips); each stub implements
the documented public behavior of the needed symbols.

Used by tests only — the framework itself never imports the reference.
"""

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def _install(name: str, module: types.ModuleType) -> None:
    sys.modules.setdefault(name, module)


def install_reference_stubs() -> None:
    # --- antialias.Downsample: Zhang-2019 blur-pool (unused at fusion eval) ---
    antialias = types.ModuleType("antialias")

    class Downsample(nn.Module):
        def __init__(self, channels, filt_size=3, stride=2):
            super().__init__()
            from math import comb

            k1 = torch.tensor([comb(filt_size - 1, i) for i in range(filt_size)], dtype=torch.float32)
            k2 = torch.outer(k1, k1)
            k2 = k2 / k2.sum()
            self.register_buffer("filt", k2[None, None].repeat(channels, 1, 1, 1))
            self.stride = stride
            self.channels = channels
            self.pad = [(filt_size - 1) // 2, filt_size - 1 - (filt_size - 1) // 2] * 2

        def forward(self, x):
            x = F.pad(x, self.pad, mode="reflect")
            return F.conv2d(x, self.filt, stride=self.stride, groups=self.channels)

    antialias.Downsample = Downsample
    _install("antialias", antialias)

    # --- guided_filter_pytorch: He et al. fast guided filter -----------------
    gf_pkg = types.ModuleType("guided_filter_pytorch")
    gf_mod = types.ModuleType("guided_filter_pytorch.guided_filter")

    def _diff(cum: torch.Tensor, r: int, dim: int) -> torch.Tensor:
        n = cum.shape[dim]

        def sl(a, b):
            idx = [slice(None)] * cum.ndim
            idx[dim] = slice(a, b)
            return cum[tuple(idx)]

        left = sl(r, 2 * r + 1)
        middle = sl(2 * r + 1, n) - sl(0, n - 2 * r - 1)
        right = sl(n - 1, n) - sl(n - 2 * r - 1, n - r - 1)
        return torch.cat([left, middle, right], dim=dim)

    class BoxFilter(nn.Module):
        def __init__(self, r):
            super().__init__()
            self.r = r

        def forward(self, x):
            return _diff(_diff(x.cumsum(dim=2), self.r, 2).cumsum(dim=3), self.r, 3)

    class GuidedFilter(nn.Module):
        def __init__(self, r, eps=1e-8):
            super().__init__()
            self.r, self.eps = r, eps
            self.boxfilter = BoxFilter(r)

        def forward(self, x, y):
            n = self.boxfilter(torch.ones_like(x[:, :1]))
            mean_x = self.boxfilter(x) / n
            mean_y = self.boxfilter(y) / n
            cov_xy = self.boxfilter(x * y) / n - mean_x * mean_y
            var_x = self.boxfilter(x * x) / n - mean_x * mean_x
            a = cov_xy / (var_x + self.eps)
            b = mean_y - a * mean_x
            mean_a = self.boxfilter(a) / n
            mean_b = self.boxfilter(b) / n
            return mean_a * x + mean_b

    gf_mod.GuidedFilter = GuidedFilter
    gf_mod.BoxFilter = BoxFilter
    gf_pkg.guided_filter = gf_mod
    _install("guided_filter_pytorch", gf_pkg)
    _install("guided_filter_pytorch.guided_filter", gf_mod)

    # --- mmcv.cnn.ConvModule: conv (no bias with norm) -> BN -> ReLU ---------
    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")

    class ConvModule(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, norm_cfg=None, **kw):
            super().__init__()
            self.conv = nn.Conv2d(
                in_channels, out_channels, kernel_size, bias=norm_cfg is None
            )
            self.bn = nn.BatchNorm2d(out_channels) if norm_cfg is not None else None
            self.activate = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.conv(x)
            if self.bn is not None:
                x = self.bn(x)
            return self.activate(x)

    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.DepthwiseSeparableConvModule = ConvModule  # imported, unused
    mmcv.cnn = mmcv_cnn
    _install("mmcv", mmcv)
    _install("mmcv.cnn", mmcv_cnn)

    # --- timm.models.layers: DropPath / to_2tuple / trunc_normal_ ------------
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = nn.init.trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models
    _install("timm", timm)
    _install("timm.models", timm_models)
    _install("timm.models.layers", timm_layers)

    # --- lap_loss: a local module ABSENT from the reference repo itself ------
    # (core/loss.py:11 imports it; any functional Laplacian-pyramid loss works)
    lap = types.ModuleType("lap_loss")

    class LapLoss2(nn.Module):
        def __init__(self, levels=3):
            super().__init__()
            self.levels = levels

        @staticmethod
        def _pyr(x, levels):
            out = []
            for _ in range(levels):
                down = F.avg_pool2d(x, 2)
                up = F.interpolate(down, size=x.shape[2:], mode="bilinear", align_corners=False)
                out.append(x - up)
                x = down
            out.append(x)
            return out

        def forward(self, gen, a, b):
            target = torch.max(a, b)
            loss = 0.0
            for pg, pt in zip(self._pyr(gen, self.levels), self._pyr(target, self.levels)):
                loss = loss + F.l1_loss(pg, pt)
            return loss

    lap.LapLoss2 = LapLoss2
    lap.LapLoss = LapLoss2
    _install("lap_loss", lap)

    # --- lpips (imported by attack/, unused in parity paths) -----------------
    lpips = types.ModuleType("lpips")
    lpips.LPIPS = object
    _install("lpips", lpips)

    # Reference color transforms call .cuda(); make it a CPU no-op.
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
