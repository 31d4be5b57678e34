"""Fake modules so the IINet torch oracle loads in this offline image.

IINet's networks.py imports `antialiased_cnns`, `torchvision.models`,
`torchvision.ops.FeaturePyramidNetwork`, `timm` (mobilenetv3_large_100 +
timm.models.mobilenetv3._cfg) and its loss imports `kornia`. None are used
by the shipped 'unet' matching-encoder config except the timm trunk, so
the fakes are: import-time stubs for the unused pieces, a faithful torch
re-implementation of timm's mobilenetv3_large_100 block tree (the exact
topology IINet slices, networks.py:355-371), and kornia's two filters with
their documented semantics (separable gaussian, reflect pad; normalized
first-order sobel, replicate pad).
"""

import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# timm mobilenetv3_large_100 (feature trunk only — blocks 0-5 + stem)
# ---------------------------------------------------------------------------

def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return int(new_v)


class _SE(nn.Module):
    def __init__(self, chs, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, reduced, 1)
        self.act1 = nn.ReLU(inplace=True)
        self.conv_expand = nn.Conv2d(reduced, chs, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * F.hardsigmoid(s)


class _DsBlock(nn.Module):
    """timm DepthwiseSeparableConv (blocks.0.0)."""

    def __init__(self, chs=16):
        super().__init__()
        self.conv_dw = nn.Conv2d(chs, chs, 3, 1, 1, groups=chs, bias=False)
        self.bn1 = nn.BatchNorm2d(chs)
        self.act1 = nn.ReLU(inplace=True)
        self.conv_pw = nn.Conv2d(chs, chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(chs)

    def forward(self, x):
        y = self.act1(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(y))
        return x + y


class _IRBlock(nn.Module):
    """timm InvertedResidual."""

    def __init__(self, cin, cout, exp, k, stride, act, se):
        super().__init__()
        a = nn.ReLU if act == "re" else nn.Hardswish
        self.conv_pw = nn.Conv2d(cin, exp, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(exp)
        self.act1 = a(inplace=True)
        self.conv_dw = nn.Conv2d(exp, exp, k, stride, k // 2, groups=exp,
                                 bias=False)
        self.bn2 = nn.BatchNorm2d(exp)
        self.act2 = a(inplace=True)
        self.se = _SE(exp, _make_divisible(exp * 0.25)) if se else nn.Identity()
        self.conv_pwl = nn.Conv2d(exp, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.has_res = stride == 1 and cin == cout

    def forward(self, x):
        y = self.act1(self.bn1(self.conv_pw(x)))
        y = self.act2(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.has_res else y


# (cin, cout, exp, k, stride, act, se) — timm stages 0-5
_MNV3_STAGES = (
    [("ds",)],
    [(16, 24, 64, 3, 2, "re", False), (24, 24, 72, 3, 1, "re", False)],
    [(24, 40, 72, 5, 2, "re", True), (40, 40, 120, 5, 1, "re", True),
     (40, 40, 120, 5, 1, "re", True)],
    [(40, 80, 240, 3, 2, "hs", False), (80, 80, 200, 3, 1, "hs", False),
     (80, 80, 184, 3, 1, "hs", False), (80, 80, 184, 3, 1, "hs", False)],
    [(80, 112, 480, 3, 1, "hs", True), (112, 112, 672, 3, 1, "hs", True)],
    [(112, 160, 672, 5, 2, "hs", True), (160, 160, 960, 5, 1, "hs", True),
     (160, 160, 960, 5, 1, "hs", True)],
)


class MobileNetV3Large(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(16)
        self.act1 = nn.Hardswish(inplace=True)
        stages = []
        for si, blocks in enumerate(_MNV3_STAGES):
            mods = []
            for spec in blocks:
                if spec[0] == "ds":
                    mods.append(_DsBlock())
                else:
                    mods.append(_IRBlock(*spec))
            stages.append(nn.Sequential(*mods))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):
        return self.blocks(self.act1(self.bn1(self.conv_stem(x))))


# ---------------------------------------------------------------------------
# kornia.filters (gaussian_blur2d / spatial_gradient)
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(ksize, sigma):
    x = torch.arange(ksize, dtype=torch.get_default_dtype()) - (ksize - 1) / 2
    k = torch.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur2d(inp, kernel_size, sigma, border_type="reflect"):
    kh, kw = kernel_size
    sh, sw = sigma
    b, c, h, w = inp.shape
    kx = _gaussian_kernel1d(kw, sw).to(inp)
    ky = _gaussian_kernel1d(kh, sh).to(inp)
    x = F.pad(inp.reshape(b * c, 1, h, w),
              (kw // 2, kw // 2, kh // 2, kh // 2), mode=border_type)
    x = F.conv2d(x, kx.view(1, 1, 1, kw))
    x = F.conv2d(x, ky.view(1, 1, kh, 1))
    return x.reshape(b, c, h, w)


_SOBEL_X = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]) / 8.0


def spatial_gradient(inp, mode="sobel", order=1, normalized=True):
    b, c, h, w = inp.shape
    kx = _SOBEL_X.to(inp).view(1, 1, 3, 3)
    ky = _SOBEL_X.t().to(inp).view(1, 1, 3, 3)
    x = F.pad(inp.reshape(b * c, 1, h, w), (1, 1, 1, 1), mode="replicate")
    gx = F.conv2d(x, kx)
    gy = F.conv2d(x, ky)
    return torch.stack([gx, gy], dim=2).reshape(b, c, 2, h, w)


def install():
    import fake_timm
    import fake_nmrf_deps
    import fake_torchvision

    fake_nmrf_deps.install()          # timm.models.layers etc.
    fake_torchvision.install()
    timm = sys.modules["timm"]

    _orig_create = timm.create_model

    def create_model(name, pretrained=False, features_only=False, **kw):
        if name == "mobilenetv3_large_100":
            return MobileNetV3Large()
        return _orig_create(name, pretrained, features_only, **kw)

    timm.create_model = create_model
    if "timm.models.mobilenetv3" not in sys.modules:
        m3 = types.ModuleType("timm.models.mobilenetv3")
        m3._cfg = lambda url="", **kw: {"url": url, **kw}
        sys.modules["timm.models.mobilenetv3"] = m3

    if "antialiased_cnns" not in sys.modules:
        aa = types.ModuleType("antialiased_cnns")
        aa.resnet18 = None  # referenced only by the unused resnet path
        sys.modules["antialiased_cnns"] = aa

    tv = sys.modules["torchvision"]
    if "torchvision.utils" not in sys.modules:
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = None  # imported by iinet/utils.py, never called here
        tvu.make_grid = None
        sys.modules["torchvision.utils"] = tvu
        tv.utils = tvu
    if not hasattr(tv, "ops"):
        ops = types.ModuleType("torchvision.ops")
        ops.FeaturePyramidNetwork = None  # imported, never constructed
        sys.modules["torchvision.ops"] = ops
        tv.ops = ops
    if not hasattr(tv.models, "resnet18"):
        tv.models.resnet18 = None

    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        filters = types.ModuleType("kornia.filters")
        filters.gaussian_blur2d = gaussian_blur2d
        filters.spatial_gradient = spatial_gradient
        kornia.filters = filters
        sys.modules["kornia"] = kornia
        sys.modules["kornia.filters"] = filters

    if "easydict" not in sys.modules:
        try:
            import easydict  # noqa: F401
        except ImportError:
            ed = types.ModuleType("easydict")

            class EasyDict(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError:
                        raise AttributeError(k)

            ed.EasyDict = EasyDict
            sys.modules["easydict"] = ed
