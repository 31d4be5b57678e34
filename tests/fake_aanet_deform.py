"""Pure-torch stand-in for the AANet CUDA deformable-conv extension.

Installed as `stereo.libs.AANet.deform_conv` so the AANet oracle loads
(reference stereo/libs/AANet/deform_conv/deform_conv.py:190-352 wraps
deform_conv_cuda). Forward-only bilinear im2col with the CUDA kernel's
offset layout (per deformable group, (Δy, Δx) interleaved per tap,
deform_conv_cuda_kernel.cu) — the parity tests only run eval-mode
forwards.
"""

import math
import sys
import types

import torch
import torch.nn as nn
from torch.nn.modules.utils import _pair


def _bilinear_zeros(xg, py, px):
    """xg [B,G,Cg,H,W]; py/px [B,G,K,Ho,Wo] → [B,G,Cg,K,Ho,Wo]."""
    b, g, cg, h, w = xg.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            wgt = ((1 - (py - y0) if dy == 0 else py - y0)
                   * (1 - (px - x0) if dx == 0 else px - x0))
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            wgt = torch.where(valid, wgt, torch.zeros_like(wgt))
            yc = yi.clamp(0, h - 1).long()
            xc = xi.clamp(0, w - 1).long()
            idx = (yc * w + xc).view(b, g, 1, -1).expand(-1, -1, cg, -1)
            tap = torch.gather(xg.reshape(b, g, cg, h * w), 3, idx)
            tap = tap.view(b, g, cg, *py.shape[2:])
            contrib = tap * wgt.unsqueeze(2)
            out = contrib if out is None else out + contrib
    return out


def _mdc_forward(x, offset, mask, weight, bias, stride, padding, dilation,
                 groups, dg):
    assert groups == 1
    b, c, h, w = x.shape
    out_c, _, kh, kw = weight.shape
    s, p, d = stride[0], padding[0], dilation[0]
    ho = (h + 2 * p - d * (kh - 1) - 1) // s + 1
    wo = (w + 2 * p - d * (kw - 1) - 1) // s + 1
    k = kh * kw

    off = offset.view(b, dg, k, 2, ho, wo)
    ys = (torch.arange(ho, dtype=x.dtype) * s - p).view(1, 1, 1, ho, 1)
    xs = (torch.arange(wo, dtype=x.dtype) * s - p).view(1, 1, 1, 1, wo)
    ky = (torch.arange(kh, dtype=x.dtype)
          .repeat_interleave(kw) * d).view(1, 1, k, 1, 1)
    kx = (torch.arange(kw, dtype=x.dtype).repeat(kh) * d).view(1, 1, k, 1, 1)
    py = ys + ky + off[:, :, :, 0]
    px = xs + kx + off[:, :, :, 1]

    xg = x.view(b, dg, c // dg, h, w)
    cols = _bilinear_zeros(xg, py, px)                  # [B,dg,Cg,K,Ho,Wo]
    if mask is not None:
        cols = cols * mask.view(b, dg, 1, k, ho, wo)
    cols = cols.reshape(b, c, k, ho, wo)
    out = torch.einsum("bckhw,ock->bohw", cols,
                       weight.reshape(out_c, c, k))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class DeformConv(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=False):
        super().__init__()
        assert not bias
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        self.deformable_groups = deformable_groups
        self.in_channels = in_channels
        self.kernel_size = _pair(kernel_size)
        self.weight = nn.Parameter(torch.Tensor(
            out_channels, in_channels // groups, *self.kernel_size))
        n = in_channels * self.kernel_size[0] * self.kernel_size[1]
        self.weight.data.uniform_(-1 / math.sqrt(n), 1 / math.sqrt(n))

    def forward(self, x, offset):
        return _mdc_forward(x, offset, None, self.weight, None, self.stride,
                            self.padding, self.dilation, self.groups,
                            self.deformable_groups)


class ModulatedDeformConv(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=True):
        super().__init__()
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        self.deformable_groups = deformable_groups
        self.in_channels = in_channels
        self.kernel_size = _pair(kernel_size)
        self.weight = nn.Parameter(torch.Tensor(
            out_channels, in_channels // groups, *self.kernel_size))
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)
        n = in_channels * self.kernel_size[0] * self.kernel_size[1]
        self.weight.data.uniform_(-1 / math.sqrt(n), 1 / math.sqrt(n))

    def forward(self, x, offset, mask):
        return _mdc_forward(x, offset, mask, self.weight, self.bias,
                            self.stride, self.padding, self.dilation,
                            self.groups, self.deformable_groups)


def install():
    name = "stereo.libs.AANet.deform_conv"
    if name in sys.modules:
        return
    for pkg in ("stereo.libs", "stereo.libs.AANet"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    mod = types.ModuleType(name)
    mod.DeformConv = DeformConv
    mod.ModulatedDeformConv = ModulatedDeformConv
    sys.modules[name] = mod
