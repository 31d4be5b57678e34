"""Minimal stand-in for torchvision.models.resnet.BasicBlock.

torchvision is not installed in this offline image; the reference STTR
backbone imports only ``BasicBlock`` from it
(reference: stereo/modeling/models/sttr/utilities/
feat_extractor_backbone_in.py:10).  This reimplementation matches
torchvision's module structure exactly (``conv1``/``bn1``/``conv2``/
``bn2``/``downsample`` with a pluggable ``norm_layer``), so reference
checkpoints and our converter see identical state-dict keys.  Used only
by tests (parity oracles).
"""

import sys
import types

import torch.nn as nn


def _conv3x3(cin, cout, stride=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                     dilation=dilation, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        if groups != 1 or base_width != 64:
            raise ValueError("BasicBlock only supports groups=1, base_width=64")
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def install():
    """Expose as `torchvision.models.resnet` + `torchvision.transforms`
    (monster/depth_anything_v2/dpt.py:5 imports Compose for its standalone
    image API, unused by the model forward) for reference imports."""
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    resnet = types.ModuleType("torchvision.models.resnet")
    resnet.BasicBlock = BasicBlock
    models.resnet = resnet
    tv.models = models
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    transforms.Compose = Compose
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet
    sys.modules["torchvision.transforms"] = transforms
    return tv
