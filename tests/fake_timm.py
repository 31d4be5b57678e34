"""Minimal torch reimplementation of timm's ``mobilenetv2_100``.

Installed into ``sys.modules['timm']`` (see :func:`install`) so reference
model files that ``import timm`` (IGEV extractor.py:1, LightStereo
backbone.py:3, StereoBase backbone.py:6) can be loaded as numerical oracles
in this offline image — the real timm and its pretrained-weight download are
unavailable, and the parity tests compare randomly initialised weights
converted through ``openstereo_tpu.utils.torch_convert`` anyway.

State-dict key names and module topology match timm exactly
(``conv_stem``/``bn1``/``blocks.N.M.{conv_pw,bn1,conv_dw,bn2,conv_pwl,bn3}``,
depthwise-separable first block ``blocks.0.0.{conv_dw,bn1,conv_pw,bn2}``) —
the same schema encoded in tests/test_backbone_convert.py and
openstereo_tpu/utils/torch_convert.convert_timm_mobilenetv2.  Only the
pieces the reference consumes exist: ``conv_stem``, ``bn1``, ``act1`` and
the 7 block stages (classification head omitted; the reference never touches
it when slicing ``model.blocks``).
"""

import sys
import types

import torch
import torch.nn as nn


class _DsBlock(nn.Module):
    """blocks.0.0 — depthwise-separable block (timm DepthwiseSeparableConv)."""

    def __init__(self):
        super().__init__()
        self.conv_dw = nn.Conv2d(32, 32, 3, 1, 1, groups=32, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.conv_pw = nn.Conv2d(32, 16, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(16)
        self.act = nn.ReLU6(inplace=True)

    def forward(self, x):
        x = self.act(self.bn1(self.conv_dw(x)))
        return self.bn2(self.conv_pw(x))  # pw_linear: no activation


class _IRBlock(nn.Module):
    """timm InvertedResidual: pw-expand → dw → pw-linear, ReLU6."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        hid = cin * 6
        self.has_residual = stride == 1 and cin == cout
        self.conv_pw = nn.Conv2d(cin, hid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(hid)
        self.conv_dw = nn.Conv2d(hid, hid, 3, stride, 1, groups=hid, bias=False)
        self.bn2 = nn.BatchNorm2d(hid)
        self.conv_pwl = nn.Conv2d(hid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.act = nn.ReLU6(inplace=True)

    def forward(self, x):
        y = self.act(self.bn1(self.conv_pw(x)))
        y = self.act(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.has_residual else y


# (channels, repeats, first-block stride) for stages 1..6 of MobileNetV2-1.0
_STAGES = [(24, 2, 2), (32, 3, 2), (64, 4, 2), (96, 3, 1), (160, 3, 2),
           (320, 1, 1)]


class MobileNetV2(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.act1 = nn.ReLU6(inplace=True)
        stages = [nn.Sequential(_DsBlock())]
        cin = 16
        for cout, n, s in _STAGES:
            blocks = []
            for bi in range(n):
                blocks.append(_IRBlock(cin, cout, s if bi == 0 else 1))
                cin = cout
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):  # features_only taps, for completeness
        x = self.act1(self.bn1(self.conv_stem(x)))
        taps = []
        for si, stage in enumerate(self.blocks):
            x = stage(x)
            if si in (0, 1, 2, 4, 5):
                taps.append(x)
        return taps


def create_model(name, pretrained=False, features_only=False, **kw):
    if name != "mobilenetv2_100":
        raise NotImplementedError(
            f"fake_timm only provides mobilenetv2_100 (asked for {name!r})")
    return MobileNetV2()


def install():
    """Expose this module as `timm` for reference-model imports."""
    if "timm" not in sys.modules:
        mod = types.ModuleType("timm")
        mod.create_model = create_model
        sys.modules["timm"] = mod
    return sys.modules["timm"]
