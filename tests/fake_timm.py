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


# ---------------------------------------------------------------------------
# EdgeNeXt-small — the FoundationStereo CNN trunk
# (reference foundationstereo/core/extractor.py:325 instantiates timm
# ``edgenext_small`` and consumes only .stem and .stages). State-dict schema
# matches timm edgenext.py: stem.{0,1}, stages.N.downsample.{0,1},
# stages.N.blocks.M.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma} (ConvBlock) or
# {convs.i, pos_embd.token_projection, norm_xca, gamma_xca,
#  xca.{temperature,qkv,proj}, norm, mlp.*, gamma} (SplitTransposeBlock).
# ---------------------------------------------------------------------------

import math


class _LayerNorm2d(nn.LayerNorm):
    """LayerNorm over C of NCHW (timm LayerNorm2d)."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class _Mlp(nn.Module):
    def __init__(self, dim, ratio=4):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _ConvBlock(nn.Module):
    def __init__(self, dim, kernel):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, kernel, padding=kernel // 2,
                                 groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        x = self.conv_dw(x).permute(0, 2, 3, 1)
        x = self.gamma * self.mlp(self.norm(x))
        return shortcut + x.permute(0, 3, 1, 2)


class _PositionalEncodingFourier(nn.Module):
    def __init__(self, dim, hidden_dim=32, temperature=10000):
        super().__init__()
        self.token_projection = nn.Conv2d(hidden_dim * 2, dim, 1)
        self.hidden_dim = hidden_dim
        self.temperature = temperature

    def forward(self, shape):
        b, h, w = shape
        dt = self.token_projection.weight.dtype
        ones = torch.ones(b, h, w)
        y_embed = ones.cumsum(1) / (h + 1e-6) * (2 * math.pi)
        x_embed = ones.cumsum(2) / (w + 1e-6) * (2 * math.pi)
        dim_t = torch.arange(self.hidden_dim, dtype=torch.float32)
        dim_t = self.temperature ** (
            2 * torch.div(dim_t, 2, rounding_mode="floor") / self.hidden_dim)
        pos_x = x_embed[:, :, :, None] / dim_t
        pos_y = y_embed[:, :, :, None] / dim_t
        pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                            dim=4).flatten(3)
        pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                            dim=4).flatten(3)
        pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
        return self.token_projection(pos.to(dt))


class _XCA(nn.Module):
    def __init__(self, dim, num_heads=8):
        super().__init__()
        self.num_heads = num_heads
        self.temperature = nn.Parameter(torch.ones(num_heads, 1, 1))
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        import torch.nn.functional as F
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, hd)
        qkv = qkv.permute(2, 0, 3, 4, 1)
        q, k, v = qkv.unbind(0)          # [B, nh, hd, N]
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        x = (attn.softmax(dim=-1) @ v).permute(0, 3, 1, 2).reshape(B, N, C)
        return self.proj(x)


class _SplitTransposeBlock(nn.Module):
    def __init__(self, dim, num_scales, num_heads=8, use_pos_emb=False):
        super().__init__()
        width = max(int(math.ceil(dim / num_scales)),
                    int(math.floor(dim // num_scales)))
        self.width = width
        self.convs = nn.ModuleList(
            nn.Conv2d(width, width, 3, padding=1, groups=width)
            for _ in range(max(1, num_scales - 1)))
        self.pos_embd = _PositionalEncodingFourier(dim) if use_pos_emb else None
        self.norm_xca = nn.LayerNorm(dim, eps=1e-6)
        self.gamma_xca = nn.Parameter(1e-6 * torch.ones(dim))
        self.xca = _XCA(dim, num_heads)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        spx = torch.split(x, self.width, 1)
        spo, sp = [], spx[0]
        for i, conv in enumerate(self.convs):
            if i > 0:
                sp = sp + spx[i]
            sp = conv(sp)
            spo.append(sp)
        spo.append(spx[-1])
        x = torch.cat(spo, 1)

        B, C, H, W = x.shape
        x = x.reshape(B, C, H * W).permute(0, 2, 1)
        if self.pos_embd is not None:
            pos = self.pos_embd((B, H, W)).reshape(B, -1, x.shape[1])
            x = x + pos.permute(0, 2, 1)
        x = x + self.gamma_xca * self.xca(self.norm_xca(x))
        x = x.reshape(B, H, W, C)
        x = self.gamma * self.mlp(self.norm(x))
        return shortcut + x.permute(0, 3, 1, 2)


class _EdgeNeXtStage(nn.Module):
    def __init__(self, cin, cout, depth, kernel, num_global, num_scales,
                 use_pos_emb, downsample):
        super().__init__()
        if downsample:
            self.downsample = nn.Sequential(
                _LayerNorm2d(cin, eps=1e-6), nn.Conv2d(cin, cout, 2, 2))
        else:
            self.downsample = nn.Identity()
        blocks = []
        for i in range(depth):
            if i < depth - num_global:
                blocks.append(_ConvBlock(cout, kernel))
            else:
                blocks.append(_SplitTransposeBlock(
                    cout, num_scales, use_pos_emb=use_pos_emb))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(self.downsample(x))


class EdgeNeXt(nn.Module):
    """timm ``edgenext_small``: dims (48,96,160,304), depths (3,3,9,3),
    kernels (3,5,7,9), one SDTA closing stages 1-3, pos-emb on stage 1."""

    def __init__(self):
        super().__init__()
        dims, depths = (48, 96, 160, 304), (3, 3, 9, 3)
        kernels, scales = (3, 5, 7, 9), (2, 2, 3, 4)
        glob, pos = (0, 1, 1, 1), (False, True, False, False)
        self.stem = nn.Sequential(nn.Conv2d(3, dims[0], 4, 4),
                                  _LayerNorm2d(dims[0], eps=1e-6))
        stages, cin = [], dims[0]
        for s in range(4):
            stages.append(_EdgeNeXtStage(cin, dims[s], depths[s], kernels[s],
                                         glob[s], scales[s], pos[s],
                                         downsample=s > 0))
            cin = dims[s]
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        return self.stages(self.stem(x))


def create_model(name, pretrained=False, features_only=False, **kw):
    if name == "mobilenetv2_100":
        return MobileNetV2()
    if name == "edgenext_small":
        return EdgeNeXt()
    raise NotImplementedError(
        f"fake_timm only provides mobilenetv2_100/edgenext_small "
        f"(asked for {name!r})")


def install():
    """Expose this module as `timm` for reference-model imports."""
    if "timm" not in sys.modules:
        mod = types.ModuleType("timm")
        mod.create_model = create_model
        sys.modules["timm"] = mod
    return sys.modules["timm"]
