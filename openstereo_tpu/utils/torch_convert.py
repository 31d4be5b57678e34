"""Reference (torch) checkpoint → openstereo_tpu variables.

The reference trains with PyTorch and publishes ``.pth`` checkpoints
(saved as ``{'model_state': state_dict, ...}`` — reference
stereo/utils/common_utils.py:96-111).  This module converts those
state_dicts into this framework's flax variable trees so a reference user
can bring trained weights across.

Layout rules (validated numerically in tests/test_layer_parity.py and
tests/test_reference_parity.py):

- Conv2d   (out,in,kh,kw)        → flax Conv kernel (kh,kw,in,out)
- Conv3d   (out,in,kd,kh,kw)     → (kd,kh,kw,in,out)
- Depthwise Conv2d (out,1,kh,kw) → (kh,kw,1,out) (same transpose; in=1)
- ConvTranspose2d (in,out,kh,kw) → (kh,kw,in,out) **spatially flipped**
  (torch's deconv is the gradient-of-conv; flax ConvTranspose with
  transpose_kernel=False is a fractionally-strided conv, so the kernel
  must be mirrored)
- ConvTranspose3d (in,out,kd,kh,kw) → (kd,kh,kw,in,out) spatially flipped
- Linear (out,in) → Dense kernel (in,out)
- BatchNorm weight/bias/running_mean/running_var → bn scale/bias +
  batch_stats mean/var
- A conv *bias* feeding directly into a BatchNorm (e.g. the PSMNet
  backbone's downsample convs, reference psmnet_backbone.py) is folded
  into the BN running mean (``mean' = mean - bias``): exact in eval mode
  and a no-op in train mode, so the flax side keeps bias-free convs.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

__all__ = [
    "CONVERTERS", "load_torch_state_dict", "convert", "TreeBuilder",
    "conv_kernel", "deconv_kernel",
]


def conv_kernel(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    if w.ndim == 3:  # Conv1d [out, in, k] -> [k, in, out]
        return np.ascontiguousarray(w.transpose(2, 1, 0))
    if w.ndim == 4:
        return np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    if w.ndim == 5:
        return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))
    raise ValueError(f"conv kernel rank {w.ndim}")


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    if w.ndim == 4:
        return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])
    if w.ndim == 5:
        return np.ascontiguousarray(w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1])
    raise ValueError(f"deconv kernel rank {w.ndim}")


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


class TreeBuilder:
    """Accumulates flax variables from a flat torch state_dict."""

    def __init__(self, state_dict: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in state_dict.items()
                   if not k.endswith("num_batches_tracked")}
        self.params: Dict = {}
        self.batch_stats: Dict = {}
        self.used = set()

    # -- low level -------------------------------------------------------
    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"torch key missing: {key}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def put(self, collection: str, path: str, value: np.ndarray):
        tree = self.params if collection == "params" else self.batch_stats
        parts = path.split("/")
        for p in parts[:-1]:
            tree = tree.setdefault(p, {})
        if parts[-1] in tree:
            raise ValueError(f"duplicate target {collection}/{path}")
        tree[parts[-1]] = np.asarray(value)

    # -- module-level helpers ---------------------------------------------
    def conv(self, tkey: str, fpath: str, deconv: bool = False):
        """tkey.weight (+ optional .bias) → fpath/{conv|deconv}/kernel[,bias]."""
        sub = "deconv" if deconv else "conv"
        xform = deconv_kernel if deconv else conv_kernel
        self.put("params", f"{fpath}/{sub}/kernel", xform(self.take(f"{tkey}.weight")))
        if self.has(f"{tkey}.bias"):
            self.put("params", f"{fpath}/{sub}/bias", self.take(f"{tkey}.bias"))

    def bn(self, tkey: str, fpath: str, fold_bias: np.ndarray | None = None):
        self.put("params", f"{fpath}/bn/scale", self.take(f"{tkey}.weight"))
        self.put("params", f"{fpath}/bn/bias", self.take(f"{tkey}.bias"))
        mean = self.take(f"{tkey}.running_mean")
        if fold_bias is not None:
            mean = mean - fold_bias
        self.put("batch_stats", f"{fpath}/bn/mean", mean)
        self.put("batch_stats", f"{fpath}/bn/var", self.take(f"{tkey}.running_var"))

    def convbn(self, tprefix: str, fpath: str, deconv: bool = False,
               conv_idx: int = 0, bn_idx: int = 1):
        """Sequential(conv, bn) → ConvBlock/DeconvBlock at fpath.

        A conv bias (if present) is folded into the BN running mean.
        """
        sub = "deconv" if deconv else "conv"
        xform = deconv_kernel if deconv else conv_kernel
        self.put("params", f"{fpath}/{sub}/kernel",
                 xform(self.take(f"{tprefix}.{conv_idx}.weight")))
        fold = None
        if self.has(f"{tprefix}.{conv_idx}.bias"):
            fold = self.take(f"{tprefix}.{conv_idx}.bias")
        self.bn(f"{tprefix}.{bn_idx}", fpath, fold_bias=fold)

    def dense(self, tkey: str, fpath: str):
        self.put("params", f"{fpath}/kernel", dense_kernel(self.take(f"{tkey}.weight")))
        if self.has(f"{tkey}.bias"):
            self.put("params", f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def raw_conv(self, tkey: str, fpath: str, deconv: bool = False):
        """tkey.weight(+bias) → a bare flax nn.Conv/ConvTranspose at fpath
        (no ConvBlock nesting)."""
        xform = deconv_kernel if deconv else conv_kernel
        self.put("params", f"{fpath}/kernel", xform(self.take(f"{tkey}.weight")))
        if self.has(f"{tkey}.bias"):
            self.put("params", f"{fpath}/bias", self.take(f"{tkey}.bias"))

    def drop(self, prefix: str):
        """Mark keys under prefix consumed — duplicate registrations (a torch
        module reachable under two attribute names) or params the reference
        instantiates but never uses in forward."""
        for k in list(self.sd):
            if k.startswith(prefix):
                self.used.add(k)

    # -- finish ------------------------------------------------------------
    def finish(self, allow_unused: tuple = ()) -> Dict:
        unused = [k for k in self.sd if k not in self.used
                  and not any(k.startswith(p) for p in allow_unused)]
        if unused:
            raise ValueError(f"{len(unused)} torch keys not consumed, e.g. {unused[:8]}")
        return {"params": self.params, "batch_stats": self.batch_stats}


# =========================================================================
# PSMNet (reference stereo/modeling/models/psmnet/)
# =========================================================================

def _psm_backbone(b: TreeBuilder, tpre: str = "Backbone", fpre: str = "backbone"):
    """SPP backbone (reference psmnet_backbone.py:7-121) — shared by PSMNet;
    GwcNet uses the same topology with its own names."""
    for i in range(3):
        b.convbn(f"{tpre}.firstconv.{i}", f"{fpre}/firstconv{i}")
    for layer, n in (("layer1", 3), ("layer2", 16), ("layer3", 3), ("layer4", 3)):
        for i in range(n):
            for conv in ("conv1", "conv2"):
                b.convbn(f"{tpre}.{layer}.{i}.{conv}", f"{fpre}/{layer}_{i}/{conv}")
            if b.has(f"{tpre}.{layer}.{i}.downsample.0.weight"):
                b.convbn(f"{tpre}.{layer}.{i}.downsample", f"{fpre}/{layer}_{i}/downsample")
    # reference branch1..4 pool 64,32,16,8 → ours branch0..3 pool 64,32,16,8
    for k in range(1, 5):
        b.convbn(f"{tpre}.branch{k}.1", f"{fpre}/branch{k - 1}")
    b.convbn(f"{tpre}.lastconv.0", f"{fpre}/lastconv0")
    b.conv(f"{tpre}.lastconv.1", f"{fpre}/lastconv1")


def _psm_hourglass(b: TreeBuilder, tpre: str, fpre: str):
    """3D hourglass (reference psmnet_cost_processor.py:54-132)."""
    for i in (1, 2, 3, 4):
        b.convbn(f"{tpre}.conv{i}", f"{fpre}/conv{i}")
    for i in (5, 6):
        b.convbn(f"{tpre}.conv{i}", f"{fpre}/conv{i}", deconv=True)


def convert_psmnet(sd: Dict[str, np.ndarray]) -> Dict:
    b = TreeBuilder(sd)
    _psm_backbone(b)
    agg = "CostProcessor.aggregator"
    b.convbn(f"{agg}.dres0.0", "dres0a")
    b.convbn(f"{agg}.dres0.1", "dres0b")
    b.convbn(f"{agg}.dres1.0", "dres1a")
    b.convbn(f"{agg}.dres1.1", "dres1b")
    for t, f in (("dres2", "dres2"), ("dres3", "dres3"), ("dres4", "dres4")):
        _psm_hourglass(b, f"{agg}.{t}", f)
    for j in (1, 2, 3):
        b.convbn(f"{agg}.classif{j}.0", f"classif{j}a")
        b.conv(f"{agg}.classif{j}.1", f"classif{j}b")
    # DispProcessor.disp_regression holds a fixed arange(D) conv — not a
    # learned weight (reference psmnet_disp_processor.py:46-49)
    return b.finish(allow_unused=("DispProcessor.",))


# =========================================================================
# GwcNet (reference stereo/modeling/models/gwcnet/)
# =========================================================================

def convert_gwcnet(sd: Dict[str, np.ndarray]) -> Dict:
    b = TreeBuilder(sd)
    bb = "Backbone.feature_extraction"
    # firstconv = Sequential(convbn, ReLU, convbn, ReLU, convbn, ReLU)
    for i, t in enumerate((0, 2, 4)):
        b.convbn(f"{bb}.firstconv.{t}", f"backbone/firstconv{i}")
    for layer, n in (("layer1", 3), ("layer2", 16), ("layer3", 3), ("layer4", 3)):
        for i in range(n):
            # conv1 = Sequential(convbn, ReLU); conv2 = bare convbn
            b.convbn(f"{bb}.{layer}.{i}.conv1.0", f"backbone/{layer}_{i}/conv1")
            b.convbn(f"{bb}.{layer}.{i}.conv2", f"backbone/{layer}_{i}/conv2")
            if b.has(f"{bb}.{layer}.{i}.downsample.0.weight"):
                b.convbn(f"{bb}.{layer}.{i}.downsample", f"backbone/{layer}_{i}/downsample")
    if b.has(f"{bb}.lastconv.0.0.weight"):
        b.convbn(f"{bb}.lastconv.0", "backbone/lastconv0")
        b.conv(f"{bb}.lastconv.2", "backbone/lastconv1")

    dp = "DispProcessor"
    # dres0 = Seq(convbn_3d, ReLU, convbn_3d, ReLU); dres1 drops the last ReLU
    b.convbn(f"{dp}.dres0.0", "dres0a")
    b.convbn(f"{dp}.dres0.2", "dres0b")
    b.convbn(f"{dp}.dres1.0", "dres1a")
    b.convbn(f"{dp}.dres1.2", "dres1b")
    for hg in ("dres2", "dres3", "dres4"):
        for i in (1, 2, 3, 4):
            b.convbn(f"{dp}.{hg}.conv{i}.0", f"{hg}/conv{i}")
        for i in (5, 6):
            b.convbn(f"{dp}.{hg}.conv{i}", f"{hg}/conv{i}", deconv=True)
        for r in ("redir1", "redir2"):
            b.convbn(f"{dp}.{hg}.{r}", f"{hg}/{r}")
    for j in (0, 1, 2, 3):
        b.convbn(f"{dp}.classif{j}.0", f"classif{j}a")
        b.conv(f"{dp}.classif{j}.2", f"classif{j}b")
    return b.finish()


# =========================================================================
# MSNet 2D/3D (reference stereo/modeling/models/msnet/)
# =========================================================================

def _mv2(b: TreeBuilder, tpre: str, fpath: str):
    """MobileV2Residual: torch Sequential indices (0,1)=pw, (3,4)=dw,
    (6,7)=pw_linear."""
    for (ci, bi), sub in (((0, 1), "pw"), ((3, 4), "dw"), ((6, 7), "pw_linear")):
        b.put("params", f"{fpath}/{sub}/conv/kernel",
              conv_kernel(b.take(f"{tpre}.{ci}.weight")))
        b.bn(f"{tpre}.{bi}", f"{fpath}/{sub}")


def _mv1(b: TreeBuilder, tpre: str, fpath: str):
    """MobileV1Residual: conv1/conv2 = Seq(dw conv,bn,relu6, pw conv,bn);
    optional downsample convbn (reference msnet/submodule.py:45-91)."""
    for conv in ("conv1", "conv2"):
        for (ci, bi), sub in (((0, 1), f"{conv}_dw"), ((3, 4), f"{conv}_pw")):
            b.put("params", f"{fpath}/{sub}/conv/kernel",
                  conv_kernel(b.take(f"{tpre}.{conv}.{ci}.weight")))
            b.bn(f"{tpre}.{conv}.{bi}", f"{fpath}/{sub}")
    if b.has(f"{tpre}.downsample.0.weight"):
        b.convbn(f"{tpre}.downsample", f"{fpath}/downsample")


def _mobile_trunk(b: TreeBuilder, tpre: str, fpre: str, add_relus: bool = False):
    """MSNet feature trunk (reference msnet/submodule.py:183-234).
    With add_relus (MSNet2D) the stem interleaves nn.ReLU modules, shifting
    the Sequential indices to 0,2,4."""
    stem = (0, 2, 4) if add_relus else (0, 1, 2)
    for i, t in enumerate(stem):
        _mv2(b, f"{tpre}.firstconv.{t}.conv", f"{fpre}/firstconv{i}")
    for layer, n in (("layer1", 3), ("layer2", 16), ("layer3", 3), ("layer4", 3)):
        for i in range(n):
            _mv1(b, f"{tpre}.{layer}.{i}", f"{fpre}/{layer}_{i}")


def _mobile_hourglass(b: TreeBuilder, tpre: str, fpre: str):
    """MobileV2-residual hourglass, 2D or 3D (reference MSNet3D.py:10-46)."""
    for name in ("conv1", "conv2", "conv3", "conv4", "redir1", "redir2"):
        _mv2(b, f"{tpre}.{name}.conv", f"{fpre}/{name}")
    for name in ("conv5", "conv6"):
        b.convbn(f"{tpre}.{name}", f"{fpre}/{name}", deconv=True)


def convert_msnet2d(sd: Dict[str, np.ndarray]) -> Dict:
    b = TreeBuilder(sd)
    _mobile_trunk(b, "feature_extraction", "trunk", add_relus=True)
    # preconv11 = Seq(convbn,relu, convbn,relu, convbn,relu, Conv2d(bias))
    for i, t in enumerate((0, 2, 4)):
        b.convbn(f"preconv11.{t}", f"preconv{i}")
    b.put("params", "preconv3/kernel", conv_kernel(b.take("preconv11.6.weight")))
    b.put("params", "preconv3/bias", b.take("preconv11.6.bias"))
    # interlaced compressor: conv3d = Seq((conv3d+bias, bn, relu) ×3)
    for i, t in enumerate((0, 3, 6)):
        b.conv(f"conv3d.{t}", f"compressor/c{i}")
        b.bn(f"conv3d.{t + 1}", f"compressor/c{i}")
    b.convbn("volume11.0", "compressor/volume11")
    # dres0 = Seq(mv2, ReLU, mv2, ReLU); dres1 = Seq(mv2, ReLU, mv2)
    for t, f in (("dres0.0", "dres0a"), ("dres0.2", "dres0b"),
                 ("dres1.0", "dres1a"), ("dres1.2", "dres1b")):
        _mv2(b, f"{t}.conv", f)
    for i in (1, 2, 3):
        _mobile_hourglass(b, f"encoder_decoder{i}", f"hg{i}")
    for j in (0, 1, 2, 3):
        b.convbn(f"classif{j}.0", f"classif{j}a")
        b.conv(f"classif{j}.2", f"classif{j}b")
    return b.finish()


def convert_msnet3d(sd: Dict[str, np.ndarray]) -> Dict:
    b = TreeBuilder(sd)
    _mobile_trunk(b, "feature_extraction", "trunk")
    for t, f in (("dres0.0", "dres0a"), ("dres0.1", "dres0b"),
                 ("dres1.0", "dres1a"), ("dres1.1", "dres1b")):
        _mv2(b, f"{t}.conv", f)
    for i in (1, 2, 3):
        _mobile_hourglass(b, f"encoder_decoder{i}", f"hg{i}")
    for j in (0, 1, 2, 3):
        b.convbn(f"classif{j}.0", f"classif{j}a")
        b.conv(f"classif{j}.2", f"classif{j}b")
    return b.finish()


# =========================================================================
# timm MobileNetV2-1.0 ImageNet backbone
# =========================================================================

def convert_timm_mobilenetv2(sd: Dict[str, np.ndarray]) -> Dict:
    """timm `mobilenetv2_100` state_dict → `MobileNetV2Features` variables.

    The reference initializes LightStereo/CoEx/IGEV trunks from timm's
    ImageNet weights (reference: stereo/modeling/models/lightstereo/
    backbone.py:33-36, igev/extractor.py:321-330); this converter lets the
    same initialization be injected here via MODEL.PRETRAINED_MODEL after
    nesting under the model's trunk path (tools/convert_ckpt.py --prefix:
    LightStereo `backbone/trunk`, IGEV `feature/trunk`, CoEx `trunk`).

    timm's classification head (conv_head/bn2/classifier) and the final
    320-channel stage (blocks.6) sit past the last feature tap and are
    dropped, exactly like timm features_only=True.
    """
    b = TreeBuilder(sd)
    b.conv("conv_stem", "stem")
    b.bn("bn1", "stem")
    # stage 0: DepthwiseSeparableConv (expand_ratio 1 — no pw expansion)
    b.conv("blocks.0.0.conv_dw", "stage0_block0/dw")
    b.bn("blocks.0.0.bn1", "stage0_block0/dw")
    b.conv("blocks.0.0.conv_pw", "stage0_block0/pw_linear")
    b.bn("blocks.0.0.bn2", "stage0_block0/pw_linear")
    # stages 1-5: InvertedResidual (pw → dw → pw_linear)
    for si, n in ((1, 2), (2, 3), (3, 4), (4, 3), (5, 3)):
        for bi in range(n):
            t, f = f"blocks.{si}.{bi}", f"stage{si}_block{bi}"
            b.conv(f"{t}.conv_pw", f"{f}/pw")
            b.bn(f"{t}.bn1", f"{f}/pw")
            b.conv(f"{t}.conv_dw", f"{f}/dw")
            b.bn(f"{t}.bn2", f"{f}/dw")
            b.conv(f"{t}.conv_pwl", f"{f}/pw_linear")
            b.bn(f"{t}.bn3", f"{f}/pw_linear")
    return b.finish(allow_unused=("blocks.6.", "conv_head", "bn2.",
                                  "classifier"))


# =========================================================================
# LightStereo (reference stereo/modeling/models/lightstereo/)
# =========================================================================

def _ls_trunk(b: TreeBuilder, tpre: str, fpre: str):
    """LightStereo Backbone's timm re-slice (reference backbone.py:41-48):
    block0..2 = blocks[0..2], block3 = Sequential(blocks[3:5]), block4 =
    blocks[5] — one fewer Sequential level than the IGEV slicing."""
    b.conv(f"{tpre}.conv_stem", f"{fpre}/stem")
    b.bn(f"{tpre}.bn1", f"{fpre}/stem")
    ds = f"{tpre}.block0.0"
    b.conv(f"{ds}.conv_dw", f"{fpre}/stage0_block0/dw")
    b.bn(f"{ds}.bn1", f"{fpre}/stage0_block0/dw")
    b.conv(f"{ds}.conv_pw", f"{fpre}/stage0_block0/pw_linear")
    b.bn(f"{ds}.bn2", f"{fpre}/stage0_block0/pw_linear")
    layout = {"block1": [(1, 2)], "block2": [(2, 3)],
              "block3": [(3, 4), (4, 3)], "block4": [(5, 3)]}
    for blk, stages in layout.items():
        for si, n in stages:
            # slicing nn.Sequential keeps the original child names, so
            # block3 (= blocks[3:5]) exposes sub-Sequentials "3" and "4"
            mid = f".{si}" if blk == "block3" else ""
            for bi in range(n):
                t, f = f"{tpre}.{blk}{mid}.{bi}", f"{fpre}/stage{si}_block{bi}"
                b.conv(f"{t}.conv_pw", f"{f}/pw")
                b.bn(f"{t}.bn1", f"{f}/pw")
                b.conv(f"{t}.conv_dw", f"{f}/dw")
                b.bn(f"{t}.bn2", f"{f}/dw")
                b.conv(f"{t}.conv_pwl", f"{f}/pw_linear")
                b.bn(f"{t}.bn3", f"{f}/pw_linear")


def _mv2_residual(b: TreeBuilder, tpre: str, fpre: str):
    """MobileV2Residual (reference lightstereo/aggregation.py:67-105)."""
    b.convbn(f"{tpre}.pwconv", f"{fpre}/pw")
    b.convbn(f"{tpre}.dwconv", f"{fpre}/dw")
    b.convbn(f"{tpre}.pwliner", f"{fpre}/pw_linear")


def _ls_attention(b: TreeBuilder, tpre: str, fpre: str):
    """AttentionModule strip convs (reference aggregation.py:108-134)."""
    b.raw_conv(f"{tpre}.conv0", f"{fpre}/proj")
    for f, t in (("strip7", "0"), ("strip11", "1"), ("strip21", "2")):
        b.raw_conv(f"{tpre}.conv{t}_1", f"{fpre}/{f}_h")
        b.raw_conv(f"{tpre}.conv{t}_2", f"{fpre}/{f}_v")
    b.raw_conv(f"{tpre}.conv3", f"{fpre}/out")


def _ls_fpn(b: TreeBuilder, tpre: str, fpre: str):
    """FPNLayer: BasicDeconv2d + BasicConv2d, both BN (backbone.py:11-27)."""
    b.convbn(f"{tpre}.deconv.block", f"{fpre}/deconv", deconv=True)
    b.convbn(f"{tpre}.conv.block", f"{fpre}/conv")


def convert_lightstereo(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference LightStereo (lightstereo.py:12-70) → flax LightStereo.

    Works for S/M/L (MobileNetV2 trunk); the block counts are inferred from
    the state_dict so one converter covers all aggregation depths."""
    b = TreeBuilder(sd)
    # backbone: trunk + FPN + InstanceNorm out_conv (norm param-free)
    _ls_trunk(b, "backbone", "backbone/trunk")
    for k, f in (("fpn_layer4", "fpn4"), ("fpn_layer3", "fpn3"),
                 ("fpn_layer2", "fpn2")):
        _ls_fpn(b, f"backbone.{k}", f"backbone/{f}")
    b.conv("backbone.out_conv.block.0", "backbone/out_conv")

    # aggregation UNet (reference aggregation.py:7-64)
    agg = "cost_agg"

    def seq_len(prefix):
        n = 0
        while b.has(f"{prefix}.{n}.pwconv.0.weight"):
            n += 1
        return n

    for i in range(seq_len(f"{agg}.conv0")):
        _mv2_residual(b, f"{agg}.conv0.{i}", f"{agg}/conv0_{i}")
    _mv2_residual(b, f"{agg}.conv1", f"{agg}/down1")
    for i in range(seq_len(f"{agg}.conv2")):
        _mv2_residual(b, f"{agg}.conv2.{i}", f"{agg}/conv2_{i}")
    _mv2_residual(b, f"{agg}.conv3", f"{agg}/down3")
    for i in range(seq_len(f"{agg}.conv4")):
        _mv2_residual(b, f"{agg}.conv4.{i}", f"{agg}/conv4_{i}")
    for t, f in (("att0", "att0"), ("att2", "att2"), ("att4", "att4")):
        _ls_attention(b, f"{agg}.{t}", f"{agg}/{f}")
    b.convbn(f"{agg}.conv5", f"{agg}/up5", deconv=True)
    b.convbn(f"{agg}.conv6", f"{agg}/up6", deconv=True)
    _mv2_residual(b, f"{agg}.redir1", f"{agg}/redir1")
    _mv2_residual(b, f"{agg}.redir2", f"{agg}/redir2")

    # superpixel refinement head (lightstereo.py:29-42)
    b.conv("refine_1.0.block.0", "refine1a")
    b.conv("refine_1.1.block.0", "refine1b")
    b.convbn("stem_2.0.block", "stem2a")
    b.convbn("stem_2.1.block", "stem2b")
    _ls_fpn(b, "refine_2", "refine2")
    b.conv("refine_3.block.0", "refine3", deconv=True)
    return b.finish()


# =========================================================================
# CasStereo (reference stereo/modeling/models/casnet/{cas_psm,cas_gwc}.py)
# =========================================================================

def _psm_resblocks(b: TreeBuilder, tpre: str, fpre: str):
    """PSM BasicBlock layers 1-4 (conv1 = Seq(convbn, ReLU); conv2 bare)."""
    for layer, n in (("layer1", 3), ("layer2", 16), ("layer3", 3), ("layer4", 3)):
        for i in range(n):
            b.convbn(f"{tpre}.{layer}.{i}.conv1.0", f"{fpre}/{layer}_{i}/conv1")
            b.convbn(f"{tpre}.{layer}.{i}.conv2", f"{fpre}/{layer}_{i}/conv2")
            if b.has(f"{tpre}.{layer}.{i}.downsample.0.weight"):
                b.convbn(f"{tpre}.{layer}.{i}.downsample",
                         f"{fpre}/{layer}_{i}/downsample")


def _cas_cost_agg(b: TreeBuilder, tpre: str, fpre: str):
    """CostAggregation (cas_psm.py:183-279): dres0/1 pairs, 3 redir
    hourglasses, 4 classifier heads."""
    b.convbn(f"{tpre}.dres0.0", f"{fpre}/dres0a")
    b.convbn(f"{tpre}.dres0.2", f"{fpre}/dres0b")
    b.convbn(f"{tpre}.dres1.0", f"{fpre}/dres1a")
    b.convbn(f"{tpre}.dres1.2", f"{fpre}/dres1b")
    for hg in ("dres2", "dres3", "dres4"):
        for i in (1, 2, 3, 4):
            b.convbn(f"{tpre}.{hg}.conv{i}.0", f"{fpre}/{hg}/conv{i}")
        for i in (5, 6):
            b.convbn(f"{tpre}.{hg}.conv{i}", f"{fpre}/{hg}/conv{i}", deconv=True)
        for r in ("redir1", "redir2"):
            b.convbn(f"{tpre}.{hg}.{r}", f"{fpre}/{hg}/{r}")
    for j in (0, 1, 2, 3):
        b.convbn(f"{tpre}.classif{j}.0", f"{fpre}/classif{j}a")
        b.conv(f"{tpre}.classif{j}.2", f"{fpre}/classif{j}b")


def convert_casnet(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference CasPSMNet / CasGwcNet → flax variables. The trunk variant
    is inferred from the state_dict (SPP branches → PSM, out1_cat → Gwc)."""
    b = TreeBuilder(sd)
    fe, f = "feature_extraction", "features"
    b.convbn(f"{fe}.firstconv_a.0", f"{f}/firstconv_a0")
    b.convbn(f"{fe}.firstconv_a.2", f"{f}/firstconv_a1")
    b.convbn(f"{fe}.firstconv_b.0", f"{f}/firstconv_b")
    _psm_resblocks(b, fe, f)
    if b.has(f"{fe}.branch1.1.0.weight"):  # PSM (SPP + inner0/lastconv)
        for k in range(1, 5):
            b.convbn(f"{fe}.branch{k}.1", f"{f}/branch{k - 1}")
        b.convbn(f"{fe}.inner0.0", f"{f}/inner0a")
        b.raw_conv(f"{fe}.inner0.2", f"{f}/inner0b")
        b.raw_conv(f"{fe}.lastconv", f"{f}/lastconv")
        n_stage = 2 + b.has(f"{fe}.inner2.weight")
        for i in range(1, n_stage):
            b.raw_conv(f"{fe}.inner{i}", f"{f}/inner{i}")
            b.raw_conv(f"{fe}.out{i + 1}", f"{f}/out{i + 1}")
    else:  # Gwc (nospp + per-stage cat heads)
        b.convbn(f"{fe}.out1_cat.0", f"{f}/out1_cat_a")
        b.raw_conv(f"{fe}.out1_cat.2", f"{f}/out1_cat_b")
        n_stage = 2 + b.has(f"{fe}.inner2.weight")
        for i in range(1, n_stage):
            b.raw_conv(f"{fe}.inner{i}", f"{f}/inner{i}")
            b.raw_conv(f"{fe}.out{i + 1}", f"{f}/out{i + 1}")
            b.raw_conv(f"{fe}.out{i + 1}_cat", f"{f}/out{i + 1}_cat")
    si = 0
    while b.has(f"cost_agg.{si}.dres0.0.0.weight"):
        _cas_cost_agg(b, f"cost_agg.{si}", f"cost_agg{si}")
        si += 1
    return b.finish()


# =========================================================================
# STTR (reference stereo/modeling/models/sttr/)
# =========================================================================

def _wn_conv(b: TreeBuilder, tkey: str, fpath: str):
    """torch weight_norm conv (weight_g [O,1,1,1] + weight_v [O,I,kh,kw] +
    bias) → WNConv params {g [O], v [kh,kw,I,O], b [O]}."""
    b.put("params", f"{fpath}/g", b.take(f"{tkey}.weight_g").reshape(-1))
    b.put("params", f"{fpath}/v", conv_kernel(b.take(f"{tkey}.weight_v")))
    b.put("params", f"{fpath}/b", b.take(f"{tkey}.bias"))


def _mha_relative(b: TreeBuilder, tkey: str, fpath: str):
    """torch MultiheadAttentionRelative (packed in_proj [3C,C]) → split
    q/k/v Dense kernels (reference attention.py:40-63 row slicing)."""
    w = b.take(f"{tkey}.in_proj_weight")
    bias = b.take(f"{tkey}.in_proj_bias")
    c = w.shape[1]
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        b.put("params", f"{fpath}/{name}/kernel",
              dense_kernel(w[i * c:(i + 1) * c]))
        b.put("params", f"{fpath}/{name}/bias", bias[i * c:(i + 1) * c])
    b.put("params", f"{fpath}/out_proj/kernel",
          dense_kernel(b.take(f"{tkey}.out_proj.weight")))
    b.put("params", f"{fpath}/out_proj/bias", b.take(f"{tkey}.out_proj.bias"))


def _layer_norm(b: TreeBuilder, tkey: str, fpath: str):
    b.put("params", f"{fpath}/scale", b.take(f"{tkey}.weight"))
    b.put("params", f"{fpath}/bias", b.take(f"{tkey}.bias"))


def convert_sttr(sd: Dict[str, np.ndarray], num_attn_layers: int = 6,
                 cal_num_blocks: int = 8) -> Dict:
    """Reference STTR (sttr.py:17-141) → flax STTR variables.

    All reference norms are parameter-free InstanceNorm (and BN tracking is
    disabled, sttr.py:60-70), so there is no batch_stats collection; the
    transformer's constructed-but-unused final LayerNorm
    (transformer.py:32) is dropped."""
    b = TreeBuilder(sd)
    # SppBackbone (feat_extractor_backbone_in.py:13-103)
    for ti, fi in ((0, 0), (3, 1), (6, 2)):
        b.conv(f"backbone.in_conv.{ti}", f"backbone/in_conv{fi}")
    for blk, f in (("resblock_1", "res1"), ("resblock_2", "res2")):
        for i in range(3):
            b.conv(f"backbone.{blk}.{i}.conv1", f"backbone/{f}_{i}/conv1")
            b.conv(f"backbone.{blk}.{i}.conv2", f"backbone/{f}_{i}/conv2")
        b.conv(f"backbone.{blk}.0.downsample.0", f"backbone/{f}_0/downsample")
    for k in range(4):
        b.conv(f"backbone.branch{k + 1}.1", f"backbone/branch{k}")

    # Tokenizer (feat_extractor_tokenizer.py:63-120): bottleneck + 2 dense
    # blocks + DoubleConv, deconv TransitionUps (last is the ×4 two-stage)
    for blk, f in (("bottle_neck", "bottleneck"), ("dense_block.0", "dense0"),
                   ("dense_block.1", "dense1")):
        for li in range(4):
            for ci in (1, 2):
                b.raw_conv(f"tokenizer.{blk}.denselayer{li + 1}.conv{ci}",
                           f"tokenizer/{f}/conv{ci}_{li}")
    b.raw_conv("tokenizer.up.0.convTrans", "tokenizer/up0/up1", deconv=True)
    b.raw_conv("tokenizer.up.1.convTrans", "tokenizer/up1/up1", deconv=True)
    b.raw_conv("tokenizer.up.2.convTrans.0", "tokenizer/up2/up1", deconv=True)
    b.raw_conv("tokenizer.up.2.convTrans.2", "tokenizer/up2/up2", deconv=True)
    b.conv("tokenizer.dense_block.2.double_conv.0", "tokenizer/final0")
    b.conv("tokenizer.dense_block.2.double_conv.3", "tokenizer/final1")

    # Transformer (transformer.py:17-113)
    for i in range(num_attn_layers):
        t, f = f"transformer.self_attn_layers.{i}", f"transformer/self_{i}"
        _layer_norm(b, f"{t}.norm1", f"{f}/norm1")
        _mha_relative(b, f"{t}.self_attn", f"{f}/self_attn")
        t, f = f"transformer.cross_attn_layers.{i}", f"transformer/cross_{i}"
        _layer_norm(b, f"{t}.norm1", f"{f}/norm1")
        _layer_norm(b, f"{t}.norm2", f"{f}/norm2")
        _mha_relative(b, f"{t}.cross_attn", f"{f}/cross_attn")
    b.drop("transformer.norm.")  # instantiated, never applied

    # Regression head: OT dustbin cost + context adjustment
    b.put("params", "phi", b.take("regression_head.phi").reshape(()))
    cal = "regression_head.cal"
    b.raw_conv(f"{cal}.in_conv", "cal/in_conv")
    b.raw_conv(f"{cal}.out_conv", "cal/out_conv")
    for i in range(cal_num_blocks):
        _wn_conv(b, f"{cal}.layers.{i}.module.0", f"cal/res{i}_a")
        _wn_conv(b, f"{cal}.layers.{i}.module.2", f"cal/res{i}_b")
    for ti, fi in ((0, 0), (1, 1), (3, 2), (4, 3)):
        _wn_conv(b, f"{cal}.occ_head.{ti}", f"cal/occ{fi}")
    b.raw_conv(f"{cal}.occ_head.6", "cal/occ4")
    return b.finish()


# =========================================================================
# IGEV / StereoBase (reference stereo/modeling/models/{igev,stereobase}/)
# =========================================================================

def _timm_trunk_sliced(b: TreeBuilder, tpre: str, fpre: str):
    """timm mobilenetv2_100 re-sliced into blockK Sequentials
    (reference igev/extractor.py:331-337 and stereobase/backbone.py:42-46
    wrap `Sequential(*model.blocks[i:j])`, adding one Sequential index:
    blockK.<stage-within-slice>.<block>)."""
    b.conv(f"{tpre}.conv_stem", f"{fpre}/stem")
    b.bn(f"{tpre}.bn1", f"{fpre}/stem")
    ds = f"{tpre}.block0.0.0"
    b.conv(f"{ds}.conv_dw", f"{fpre}/stage0_block0/dw")
    b.bn(f"{ds}.bn1", f"{fpre}/stage0_block0/dw")
    b.conv(f"{ds}.conv_pw", f"{fpre}/stage0_block0/pw_linear")
    b.bn(f"{ds}.bn2", f"{fpre}/stage0_block0/pw_linear")
    layout = {  # (torch blockK, stage index within the slice) → (flax stage, n)
        ("block1", 0): (1, 2), ("block2", 0): (2, 3),
        ("block3", 0): (3, 4), ("block3", 1): (4, 3), ("block4", 0): (5, 3),
    }
    for (blk, m), (si, n) in layout.items():
        for bi in range(n):
            t, f = f"{tpre}.{blk}.{m}.{bi}", f"{fpre}/stage{si}_block{bi}"
            b.conv(f"{t}.conv_pw", f"{f}/pw")
            b.bn(f"{t}.bn1", f"{f}/pw")
            b.conv(f"{t}.conv_dw", f"{f}/dw")
            b.bn(f"{t}.bn2", f"{f}/dw")
            b.conv(f"{t}.conv_pwl", f"{f}/pw_linear")
            b.bn(f"{t}.bn3", f"{f}/pw_linear")


def _conv2x(b: TreeBuilder, tpre: str, fpre: str, bn: bool,
            style: str = "igev"):
    """Conv2x / Conv2x_IN (igev/submodule.py:35-79,:111-155) or Conv2xUp
    (stereobase/igev_blocks.py:10-32) with deconv first stage → flax Conv2x.

    igev style: sub-convs named `.conv1.conv` (+`.conv1.bn`); stereobase
    style wraps BasicConv2d/BasicDeconv2d whose Sequential is `.block`
    (`.conv1.block.0` conv, `.conv1.block.1` norm)."""
    c1, c2 = (".conv1.conv", ".conv2.conv") if style == "igev" \
        else (".conv1.block.0", ".conv2.block.0")
    n1, n2 = (".conv1.bn", ".conv2.bn") if style == "igev" \
        else (".conv1.block.1", ".conv2.block.1")
    b.conv(f"{tpre}{c1}", f"{fpre}/conv1/conv", deconv=True)
    if bn:
        b.bn(f"{tpre}{n1}", f"{fpre}/conv1/conv")
    b.conv(f"{tpre}{c2}", f"{fpre}/conv2/conv")
    if bn:
        b.bn(f"{tpre}{n2}", f"{fpre}/conv2/conv")


def _feature_att(b: TreeBuilder, tpre: str, fpre: str, style: str = "igev"):
    """FeatureAtt (igev/submodule.py:237-250 == stereobase
    igev_blocks.py:35-48) → flax FeatureAtt att0/att1."""
    if style == "igev":
        b.conv(f"{tpre}.feat_att.0.conv", f"{fpre}/att0/conv")
        b.bn(f"{tpre}.feat_att.0.bn", f"{fpre}/att0/conv")
    else:
        b.conv(f"{tpre}.feat_att.0.block.0", f"{fpre}/att0/conv")
        b.bn(f"{tpre}.feat_att.0.block.1", f"{fpre}/att0/conv")
    b.raw_conv(f"{tpre}.feat_att.1", f"{fpre}/att1")


def _igev_feature(b: TreeBuilder, tpre: str = "feature", fpre: str = "feature",
                  style: str = "igev"):
    """IGEV/StereoBase Feature: timm trunk + Conv2x decoder + conv4."""
    _timm_trunk_sliced(b, tpre, f"{fpre}/trunk")
    for name in ("deconv32_16", "deconv16_8", "deconv8_4"):
        _conv2x(b, f"{tpre}.{name}", f"{fpre}/{name}", bn=False, style=style)
    if style == "igev":
        b.conv(f"{tpre}.conv4.conv", f"{fpre}/conv4/conv")
    else:
        b.conv(f"{tpre}.conv4.block.0", f"{fpre}/conv4/conv")


def _geo_hourglass(b: TreeBuilder, tpre: str, fpre: str, style: str = "igev"):
    """IGEV hourglass (igev_stereo.py:7-77) / StereoBase Hourglass
    (stereobase/hourglass.py:7-104) → flax GeoHourglass.

    igev spelling: BasicConv `.conv`/`.bn`; stereobase spelling: BasicConv3d
    `.block.0`/`.block.1`."""
    ck, nk = (".conv", ".bn") if style == "igev" else (".block.0", ".block.1")
    pairs = [("conv1.0", "conv1a"), ("conv1.1", "conv1b"),
             ("conv2.0", "conv2a"), ("conv2.1", "conv2b"),
             ("conv3.0", "conv3a"), ("conv3.1", "conv3b"),
             ("agg_0.0", "agg0a"), ("agg_0.1", "agg0b"), ("agg_0.2", "agg0c"),
             ("agg_1.0", "agg1a"), ("agg_1.1", "agg1b"), ("agg_1.2", "agg1c")]
    for t, f in pairs:
        b.conv(f"{tpre}.{t}{ck}", f"{fpre}/{f}/conv")
        b.bn(f"{tpre}.{t}{nk}", f"{fpre}/{f}/conv")
    for t in ("conv3_up", "conv2_up"):
        b.conv(f"{tpre}.{t}{ck}", f"{fpre}/{t}/conv", deconv=True)
        b.bn(f"{tpre}.{t}{nk}", f"{fpre}/{t}/conv")
    b.conv(f"{tpre}.conv1_up{ck}", f"{fpre}/conv1_up/conv", deconv=True)
    if style == "igev":
        # bn=False — torch BasicConv still *instantiates* self.bn
        b.drop(f"{tpre}.conv1_up.bn")
    for t, f in (("feature_att_8", "att8"), ("feature_att_16", "att16"),
                 ("feature_att_32", "att32"), ("feature_att_up_16", "att_up16"),
                 ("feature_att_up_8", "att_up8")):
        _feature_att(b, f"{tpre}.{t}", f"{fpre}/{f}", style=style)


def _ctx_res_block(b: TreeBuilder, tpre: str, fpre: str):
    """Context-net ResidualBlock (igev/extractor.py:6-59, batch norm_fn).
    torch registers norm3 both standalone and inside downsample — consume the
    downsample copy and drop the alias."""
    b.conv(f"{tpre}.conv1", f"{fpre}/conv1")
    b.bn(f"{tpre}.norm1", f"{fpre}/conv1")
    b.conv(f"{tpre}.conv2", f"{fpre}/conv2")
    b.bn(f"{tpre}.norm2", f"{fpre}/conv2")
    if b.has(f"{tpre}.downsample.0.weight"):
        b.conv(f"{tpre}.downsample.0", f"{fpre}/downsample")
        b.bn(f"{tpre}.downsample.1", f"{fpre}/downsample")
        b.drop(f"{tpre}.norm3")


def _multi_basic_encoder(b: TreeBuilder, tpre: str, fpre: str, n_out: int = 2):
    """MultiBasicEncoder (igev/extractor.py:194-298 == stereobase
    gru_blocks.py:62-149) → flax MultiBasicEncoder."""
    b.conv(f"{tpre}.conv1", f"{fpre}/conv1")
    b.bn(f"{tpre}.norm1", f"{fpre}/conv1")
    for name in ("layer1", "layer2", "layer3", "layer4", "layer5"):
        for j in (0, 1):
            _ctx_res_block(b, f"{tpre}.{name}.{j}", f"{fpre}/{name}_{j}")
    for scale in ("04", "08"):
        for oi in range(n_out):
            _ctx_res_block(b, f"{tpre}.outputs{scale}.{oi}.0",
                           f"{fpre}/out{scale}_{oi}_res")
            b.raw_conv(f"{tpre}.outputs{scale}.{oi}.1",
                       f"{fpre}/out{scale}_{oi}_conv")
    for oi in range(n_out):
        b.raw_conv(f"{tpre}.outputs16.{oi}", f"{fpre}/out16_{oi}_conv")


def _update_block(b: TreeBuilder, tpre: str = "update_block",
                  fpre: str = "gru_loop/update_block"):
    """BasicMultiUpdateBlock (igev/update.py:110-148 == stereobase
    gru_blocks.py:290-328); flax params live under the nn.scan module."""
    for k in ("convc1", "convc2", "convd1", "convd2", "conv"):
        b.raw_conv(f"{tpre}.encoder.{k}", f"{fpre}/encoder/{k}")
    for g in ("gru04", "gru08", "gru16"):
        for k in ("convz", "convr", "convq"):
            b.raw_conv(f"{tpre}.{g}.{k}", f"{fpre}/{g}/{k}")
    b.raw_conv(f"{tpre}.disp_head.conv1", f"{fpre}/disp_head/conv1")
    b.raw_conv(f"{tpre}.disp_head.conv2", f"{fpre}/disp_head/conv2")
    b.raw_conv(f"{tpre}.mask_feat_4.0", f"{fpre}/mask_feat_4")


def convert_igev(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference IGEVStereo (igev_stereo.py:79-247) → flax IGEV variables."""
    b = TreeBuilder(sd)
    _igev_feature(b)
    # stems: BasicConv_IN + plain conv (+param-free InstanceNorm/ReLU)
    b.conv("stem_2.0.conv", "stem_2a/conv")
    b.conv("stem_2.1", "stem_2b")
    b.conv("stem_4.0.conv", "stem_4a/conv")
    b.conv("stem_4.1", "stem_4b")
    # superpixel paths
    b.conv("spx_4.0.conv", "spx_4a/conv")
    b.conv("spx_4.1", "spx_4b")
    _conv2x(b, "spx_2", "spx_2", bn=False)
    b.raw_conv("spx.0", "spx", deconv=True)
    _conv2x(b, "spx_2_gru", "spx_2_gru", bn=True)
    b.raw_conv("spx_gru.0", "spx_gru", deconv=True)
    # matching descriptors + gwc stem
    b.conv("conv.conv", "conv/conv")
    b.raw_conv("desc", "desc")
    b.conv("corr_stem.conv", "corr_stem/conv")
    b.bn("corr_stem.bn", "corr_stem/conv")
    _feature_att(b, "corr_feature_att", "corr_feature_att")
    _geo_hourglass(b, "cost_agg", "cost_agg")
    b.raw_conv("classifier", "classifier")
    # context + GRU machinery
    _multi_basic_encoder(b, "cnet", "cnet")
    for i in range(3):
        b.raw_conv(f"context_zqr_convs.{i}", f"context_zqr{i}")
    _update_block(b)
    return b.finish()


def _pp_hourglass(b: TreeBuilder, tpre: str, fpre: str):
    """IGEV++ InstanceNorm hourglass (igevpp_stereo.py:22-97): norm carries
    no params; only conv kernels + the FeatureAtt convs convert."""
    pairs = [("conv0", "conv0"),
             ("conv1.0", "conv1a"), ("conv1.1", "conv1b"),
             ("conv2.0", "conv2a"), ("conv2.1", "conv2b"),
             ("conv3.0", "conv3a"), ("conv3.1", "conv3b"),
             ("agg_0.0", "agg0a"), ("agg_0.1", "agg0b"), ("agg_0.2", "agg0c"),
             ("agg_1.0", "agg1a"), ("agg_1.1", "agg1b"), ("agg_1.2", "agg1c")]
    for t, f in pairs:
        b.conv(f"{tpre}.{t}.conv", f"{fpre}/{f}/conv")
    for t in ("conv3_up", "conv2_up", "conv1_up"):
        b.conv(f"{tpre}.{t}.conv", f"{fpre}/{t}/conv", deconv=True)
    for t, f in (("feature_att_4", "att4"), ("feature_att_8", "att8"),
                 ("feature_att_16", "att16"), ("feature_att_32", "att32"),
                 ("feature_att_up_16", "att_up16"),
                 ("feature_att_up_8", "att_up8")):
        b.conv(f"{tpre}.{t}.feat_att.0.conv", f"{fpre}/{f}/att0/conv")
        b.raw_conv(f"{tpre}.{t}.feat_att.1", f"{fpre}/{f}/att1")


def convert_igevpp(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference IGEVPPStereo (igevpp_stereo.py:99-295) → flax IGEVPP."""
    b = TreeBuilder(sd)
    _igev_feature(b)
    b.conv("stem_2.0.conv", "stem_2a/conv")
    b.conv("stem_2.1", "stem_2b")
    b.conv("stem_4.0.conv", "stem_4a/conv")
    b.conv("stem_4.1", "stem_4b")
    b.conv("spx_4.0.conv", "spx_4a/conv")
    b.conv("spx_4.1", "spx_4b")
    _conv2x(b, "spx_2", "spx_2", bn=False)
    b.raw_conv("spx.0", "spx", deconv=True)
    _conv2x(b, "spx_2_gru", "spx_2_gru", bn=False)  # IN flavor in IGEV++
    b.raw_conv("spx_gru.0", "spx_gru", deconv=True)
    b.conv("conv.conv", "conv/conv")
    b.raw_conv("desc", "desc")
    b.raw_conv("patch0", "patch0")
    b.raw_conv("patch1", "patch1")
    for i in range(3):
        _pp_hourglass(b, f"cost_agg{i}", f"cost_agg{i}")
    b.raw_conv("classifier", "classifier")
    # selective fusion
    b.conv("disp_conv.0.conv", "disp_conv0/conv")
    b.conv("disp_conv.1.conv", "disp_conv1/conv")
    b.conv("selective_conv.0.conv", "selective_conv0/conv")
    b.conv("selective_conv.1.conv", "selective_conv1/conv")
    b.raw_conv("selective_conv.2", "selective_conv2")
    _multi_basic_encoder(b, "cnet", "cnet")
    for i in range(3):
        b.raw_conv(f"context_zqr_convs.{i}", f"context_zqr{i}")
    # update block: geo encoders + disp encoder + 3 GRUs
    ub = "gru_loop/update_block"
    for g in ("geo_encoder0", "geo_encoder1", "geo_encoder2"):
        b.raw_conv(f"update_block.{g}.convg1", f"{ub}/{g}/convg1")
        b.raw_conv(f"update_block.{g}.convg2", f"{ub}/{g}/convg2")
    for k in ("convc1", "convc2", "convd1", "convd2", "conv"):
        b.raw_conv(f"update_block.encoder.{k}", f"{ub}/encoder/{k}")
    for g in ("gru04", "gru08", "gru16"):
        for k in ("convz", "convr", "convq"):
            b.raw_conv(f"update_block.{g}.{k}", f"{ub}/{g}/{k}")
    b.raw_conv("update_block.disp_head.conv1", f"{ub}/disp_head/conv1")
    b.raw_conv("update_block.disp_head.conv2", f"{ub}/disp_head/conv2")
    b.raw_conv("update_block.mask_feat_4.0", f"{ub}/mask_feat_4")
    return b.finish()


def convert_igev_rt(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference IGEVRTtereo (igev_rt_stereo.py:89-242) → flax IGEVRT."""
    b = TreeBuilder(sd)
    _igev_feature(b)
    b.conv("stem_2.0.conv", "stem_2a/conv")
    b.conv("stem_2.1", "stem_2b")
    b.conv("stem_4.0.conv", "stem_4a/conv")
    b.conv("stem_4.1", "stem_4b")
    b.conv("spx_4.0.conv", "spx_4a/conv")
    b.conv("spx_4.1", "spx_4b")
    _conv2x(b, "spx_2", "spx_2", bn=False)
    b.raw_conv("spx.0", "spx", deconv=True)
    _conv2x(b, "spx_2_gru", "spx_2_gru", bn=True)
    b.raw_conv("spx_gru.0", "spx_gru", deconv=True)
    b.conv("conv.conv", "conv/conv")
    b.raw_conv("desc", "desc")
    _geo_hourglass(b, "cost_agg", "cost_agg")
    b.raw_conv("classifier", "classifier")
    # conv-only hidden/context nets (igev_rt_stereo.py:96-101)
    b.conv("hnet.0.conv", "hnet0/conv")
    b.bn("hnet.0.bn", "hnet0/conv")
    b.raw_conv("hnet.1", "hnet1")
    b.conv("cnet.conv", "cnet/conv")
    b.bn("cnet.bn", "cnet/conv")
    b.raw_conv("context_zqr_conv", "context_zqr_conv")
    # single-scale update block under the scan module
    ub = "gru_loop/update_block"
    for k in ("convc1", "convc2", "convd1", "convd2", "conv"):
        b.raw_conv(f"update_block.encoder.{k}", f"{ub}/encoder/{k}")
    for k in ("convz", "convr", "convq"):
        b.raw_conv(f"update_block.gru.{k}", f"{ub}/gru/{k}")
    b.raw_conv("update_block.disp_head.conv1", f"{ub}/disp_head/conv1")
    b.raw_conv("update_block.disp_head.conv2", f"{ub}/disp_head/conv2")
    b.raw_conv("update_block.mask_feat_4.0", f"{ub}/mask_feat_4")
    return b.finish()


def convert_stereobase(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference StereoBase (stereobase_gru.py:14-213) → flax StereoBase.

    StereoBase builds its stems/stages from common BasicConv2d/BasicDeconv2d
    (each wrapping a `.block` Sequential of conv[,norm][,act]) rather than
    the igev submodule classes — only the torch key spelling differs.
    """
    b = TreeBuilder(sd)
    _igev_feature(b, style="stereobase")
    # stems: BasicConv2d(IN, LeakyReLU) then BasicConv2d(IN, ReLU)
    b.conv("stem_2.0.block.0", "stem_2a/conv")
    b.conv("stem_2.1.block.0", "stem_2b")
    b.conv("stem_4.0.block.0", "stem_4a/conv")
    b.conv("stem_4.1.block.0", "stem_4b")
    # superpixel paths (Conv2xUp = BasicDeconv2d + BasicConv2d)
    b.conv("spx_4.0.block.0", "spx_4a/conv")
    b.conv("spx_4.1.block.0", "spx_4b")
    b.conv("spx_2.conv1.block.0", "spx_2/conv1/conv", deconv=True)
    b.conv("spx_2.conv2.block.0", "spx_2/conv2/conv")
    b.raw_conv("spx.0", "spx", deconv=True)
    b.conv("spx_2_gru.conv1.block.0", "spx_2_gru/conv1/conv", deconv=True)
    b.bn("spx_2_gru.conv1.block.1", "spx_2_gru/conv1/conv")
    b.conv("spx_2_gru.conv2.block.0", "spx_2_gru/conv2/conv")
    b.bn("spx_2_gru.conv2.block.1", "spx_2_gru/conv2/conv")
    b.raw_conv("spx_gru.0", "spx_gru", deconv=True)
    # descriptors
    b.conv("conv.block.0", "conv/conv")
    b.raw_conv("desc", "desc")
    # optional concat-volume projection
    if b.has("concat_conv.0.block.0.weight"):
        b.conv("concat_conv.0.block.0", "concat_conv0")
        b.bn("concat_conv.0.block.1", "concat_conv0")
        b.raw_conv("concat_conv.1", "concat_conv1")
    # optional interlaced-volume compressor
    if b.has("build_interlaced_volume.conv3d.0.block.0.weight"):
        iv = "build_interlaced_volume"
        for i, f in ((0, "c0"), (1, "c1"), (2, "c2")):
            b.conv(f"{iv}.conv3d.{i}.block.0", f"{iv}/{f}")
            b.bn(f"{iv}.conv3d.{i}.block.1", f"{iv}/{f}")
        b.conv(f"{iv}.volume11.block.0", f"{iv}/volume11")
        b.bn(f"{iv}.volume11.block.1", f"{iv}/volume11")
    _geo_hourglass(b, "cost_agg", "cost_agg", style="stereobase")
    b.raw_conv("classifier", "classifier")
    _multi_basic_encoder(b, "cnet", "cnet")
    for i in range(3):
        b.raw_conv(f"context_zqr_convs.{i}", f"context_zqr{i}")
    _update_block(b)
    return b.finish()


# =========================================================================
# registry
# =========================================================================

# =========================================================================
# AANet (reference stereo/modeling/models/aanet/)
# =========================================================================

def _aa_deform_conv2d(b: TreeBuilder, tpre: str, fpre: str):
    """submodule.py:199-270 DeformConv2d: grouped offset conv (bias) +
    the deformable kernel."""
    b.raw_conv(f"{tpre}.offset_conv", f"{fpre}/offset_conv")
    b.put("params", f"{fpre}/kernel",
          conv_kernel(b.take(f"{tpre}.deform_conv.weight")))


def _aa_bottleneck(b: TreeBuilder, tpre: str, fpre: str, deform: bool):
    """(Deform)Bottleneck / (Deform)SimpleBottleneck: separate convN/bnN."""
    b.conv(f"{tpre}.conv1", f"{fpre}/conv1")
    b.bn(f"{tpre}.bn1", f"{fpre}/conv1")
    if deform:
        _aa_deform_conv2d(b, f"{tpre}.conv2", f"{fpre}/conv2")
        _raw_bn(b, f"{tpre}.bn2", f"{fpre}/bn2")
    else:
        b.conv(f"{tpre}.conv2", f"{fpre}/conv2")
        b.bn(f"{tpre}.bn2", f"{fpre}/conv2")
    b.conv(f"{tpre}.conv3", f"{fpre}/conv3")
    b.bn(f"{tpre}.bn3", f"{fpre}/conv3")
    if b.has(f"{tpre}.downsample.0.weight"):
        b.conv(f"{tpre}.downsample.0", f"{fpre}/downsample")
        b.bn(f"{tpre}.downsample.1", f"{fpre}/downsample")


def _aa_refinement(b: TreeBuilder, tpre: str, fpre: str):
    """StereoDRNetRefinement (submodule.py:717-790)."""
    b.convbn(f"{tpre}.conv1", f"{fpre}/conv1")
    b.convbn(f"{tpre}.conv2", f"{fpre}/conv2")
    for k in range(6):
        db = f"{tpre}.dilated_blocks.{k}"
        b.conv(f"{db}.conv1", f"{fpre}/dil{k}a")
        b.bn(f"{db}.bn1", f"{fpre}/dil{k}a")
        b.conv(f"{db}.conv2", f"{fpre}/dil{k}b")
        b.bn(f"{db}.bn2", f"{fpre}/dil{k}b")
    b.raw_conv(f"{tpre}.final_conv", f"{fpre}/final")


def convert_aanet(sd: Dict[str, np.ndarray], num_fusions: int = 6,
                  num_deform_blocks: int = 2) -> Dict:
    """Reference aanet.py:4-133 (+ submodule.py) → models/aanet tree."""
    b = TreeBuilder(sd)
    fe = "feature_extractor"
    b.convbn(f"{fe}.conv1", "trunk/stem")
    for li, n in ((1, 3), (2, 4), (3, 6)):
        for j in range(n):
            _aa_bottleneck(b, f"{fe}.layer{li}.{j}", f"trunk/layer{li}_{j}",
                           deform=(li == 3))
    for i in range(3):
        b.raw_conv(f"fpn.lateral_convs.{i}", f"fpn/lateral{i}")
        b.convbn(f"fpn.fpn_convs.{i}", f"fpn/fpn{i}")

    for i in range(num_fusions):
        tp = f"aggregation.fusions.{i}"
        fp = f"fusion{i}"
        deform = i >= num_fusions - num_deform_blocks
        for s in range(3):
            _aa_bottleneck(b, f"{tp}.branches.{s}.0", f"{fp}/branch{s}_0",
                           deform=deform)
        for a in range(3):
            for j in range(3):
                if a == j:
                    continue
                if a < j:
                    b.convbn(f"{tp}.fuse_layers.{a}.{j}",
                             f"{fp}/fuse{a}_{j}")
                else:
                    for k in range(a - j - 1):
                        b.convbn(f"{tp}.fuse_layers.{a}.{j}.{k}",
                                 f"{fp}/fuse{a}_{j}_{k}")
                    b.convbn(f"{tp}.fuse_layers.{a}.{j}.{a - j - 1}",
                             f"{fp}/fuse{a}_{j}_last")
    for i in range(3):
        b.raw_conv(f"aggregation.final_conv.{i}", f"final_conv{i}")

    for r in range(2):
        _aa_refinement(b, f"refinement.{r}", f"refine{r}")
    return b.finish()


# =========================================================================
# FADNet (reference stereo/modeling/models/fadnet/)
# =========================================================================

def _fad_res(b: TreeBuilder, tpre: str, fpre: str):
    """fadnet ResBlock (submodule.py:350-378): biased convs + separate BNs."""
    b.conv(f"{tpre}.conv1", f"{fpre}/conv1")
    b.bn(f"{tpre}.bn1", f"{fpre}/conv1")
    b.conv(f"{tpre}.conv2", f"{fpre}/conv2")
    b.bn(f"{tpre}.bn2", f"{fpre}/conv2")
    if b.has(f"{tpre}.shortcut.0.weight"):
        b.conv(f"{tpre}.shortcut.0", f"{fpre}/shortcut")
        b.bn(f"{tpre}.shortcut.1", f"{fpre}/shortcut")


def _fad_decoder(b: TreeBuilder, tpre: str, fpre: str, pred: str):
    """7-scale pyramid decoder (fadnet_cost_processor.py:50-86 /
    fadnet_disp_predictor.py:48-82). iconvK is a stride-1 ConvTranspose2d —
    identical to a plain conv with spatially-flipped, in/out-swapped
    weights, which is exactly the deconv_kernel transform."""
    b.raw_conv(f"{tpre}.{pred}6", f"{fpre}/pred6")
    for k in range(5, -1, -1):
        b.conv(f"{tpre}.upconv{k}.0", f"{fpre}/upconv{k}", deconv=True)
        b.raw_conv(f"{tpre}.upflow{k + 1}to{k}", f"{fpre}/upflow{k}",
                   deconv=True)
        b.raw_conv(f"{tpre}.iconv{k}", f"{fpre}/iconv{k}", deconv=True)
        b.raw_conv(f"{tpre}.{pred}{k}", f"{fpre}/pred{k}")


def convert_fadnet(sd: Dict[str, np.ndarray], max_disp: int = 192) -> Dict:
    """Reference fadnet.py:12-140 → models/fadnet tree."""
    b = TreeBuilder(sd)
    b.conv("backbone.conv1.0", "conv1")
    _fad_res(b, "backbone.conv2", "conv2")
    _fad_res(b, "backbone.conv3", "conv3")

    cp = "cost_processor"
    _fad_res(b, f"{cp}.conv_redir", "conv_redir")
    # DyRes conv3_1: DynamicConv2d weights sized for MAX_RANGE=400
    # (fadnet_cost_processor.py:12,33); forward slices to the actual
    # input channels (submodule.py:283-301)
    in_c = max_disp // 8 + 16 + 32
    w = b.take(f"{cp}.conv3_1.conv1.conv.weight")[:, :in_c]
    b.put("params", "conv3_1/conv1/conv/kernel", conv_kernel(w))
    b.bn(f"{cp}.conv3_1.bn1", "conv3_1/conv1")
    b.conv(f"{cp}.conv3_1.conv2", "conv3_1/conv2")
    b.bn(f"{cp}.conv3_1.bn2", "conv3_1/conv2")
    ws = b.take(f"{cp}.conv3_1.shortcut.0.conv.weight")[:, :in_c]
    b.put("params", "conv3_1/shortcut/conv/kernel", conv_kernel(ws))
    b.bn(f"{cp}.conv3_1.shortcut.1", "conv3_1/shortcut")
    for n in ("conv4", "conv4_1", "conv5", "conv5_1", "conv6", "conv6_1"):
        _fad_res(b, f"{cp}.{n}", f"enc456/{n}")
    _fad_decoder(b, cp, "decoder_c", "pred_flow")

    dp = "disp_predictor"
    b.conv(f"{dp}.conv1.0", "res_conv1")
    _fad_res(b, f"{dp}.conv2", "res_conv2")
    _fad_res(b, f"{dp}.conv3", "res_conv3")
    _fad_res(b, f"{dp}.conv3_1", "res_conv3_1")
    for n in ("conv4", "conv4_1", "conv5", "conv5_1", "conv6", "conv6_1"):
        _fad_res(b, f"{dp}.{n}", f"res_enc456/{n}")
    _fad_decoder(b, dp, "decoder_res", "pred_res")
    return b.finish()


# =========================================================================
# CoEx (reference stereo/modeling/models/coex/)
# =========================================================================

def _coex_basicconv(b: TreeBuilder, tpre: str, fpre: str, bn: bool = True,
                    deconv: bool = False):
    """coex BasicConv (submodule.py:43-70) → BasicConvBN's inner ConvBlock."""
    b.conv(f"{tpre}.conv", f"{fpre}/conv", deconv=deconv)
    if bn:
        b.bn(f"{tpre}.bn", f"{fpre}/conv")


def _coex_channel_att(b: TreeBuilder, tpre: str, fpre: str):
    """coex channelAtt.im_att = Seq(BasicConv, Conv2d)
    (coex_cost_processor.py:68-81) → flax FeatureAtt att0/att1."""
    _coex_basicconv(b, f"{tpre}.im_att.0", f"{fpre}/att0")
    b.raw_conv(f"{tpre}.im_att.1", f"{fpre}/att1")


def convert_coex(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference coex.py:11-63 (+backbone/cost/disp processors)
    → models/coex tree."""
    b = TreeBuilder(sd)
    _timm_trunk_sliced(b, "Backbone.feat", "trunk")
    # Feature carries its own FeatUp that forward never calls
    # (coex_backbone.py:58, forward :61-68 returns raw taps)
    b.drop("Backbone.feat.up.")

    for t, f in (("deconv32_16", "deconv32_16"), ("deconv16_8", "deconv16_8"),
                 ("deconv8_4", "deconv8_4")):
        _conv2x(b, f"Backbone.up.{t}", f"up/{t}", bn=True)
    _coex_basicconv(b, "Backbone.up.conv4", "up/conv4")

    for s in ("2", "4"):
        _coex_basicconv(b, f"Backbone.stem_{s}.0", f"stem_{s}a")
        b.put("params", f"stem_{s}b/conv/conv/kernel",
              conv_kernel(b.take(f"Backbone.stem_{s}.1.weight")))
        b.bn(f"Backbone.stem_{s}.2", f"stem_{s}b/conv")

    cp = "CostProcessor"
    _coex_basicconv(b, f"{cp}.cost_volume.conv", "cv_conv")
    b.raw_conv(f"{cp}.cost_volume.desc", "cv_desc")
    agg = f"{cp}.cost_agg"
    _coex_basicconv(b, f"{agg}.conv_stem", "conv_stem")
    _coex_channel_att(b, f"{agg}.channelAttStem", "att_stem")
    for i in range(3):
        for n in range(2):
            _coex_basicconv(b, f"{agg}.conv_down.{i}.{n}", f"down{i}_{n}")
        _coex_channel_att(b, f"{agg}.channelAttDown.{i}", f"att_down{i}")
    for j in range(3):
        _coex_basicconv(b, f"{agg}.conv_up.{j}", f"up{j}", bn=j != 0,
                        deconv=True)
    # BasicConv registers a bn even when use_bn=False (submodule.py:46-61);
    # conv_up.0 runs bn-free in forward — its stats are never used
    b.drop(f"{agg}.conv_up.0.bn.")
    for j in (1, 2):
        _coex_basicconv(b, f"{agg}.conv_skip.{j}", f"skip{j}")
        _coex_basicconv(b, f"{agg}.conv_agg.{j}.0", f"agg{j}a")
        _coex_basicconv(b, f"{agg}.conv_agg.{j}.1", f"agg{j}b")
        _coex_channel_att(b, f"{agg}.channelAtt.{j}", f"att_up{j}")
    # index-0 skip/agg/att modules exist but forward breaks before using
    # them (coex_cost_processor.py:225-235)
    b.drop(f"{agg}.conv_skip.0."), b.drop(f"{agg}.conv_agg.0.")
    b.drop(f"{agg}.channelAtt.0.")

    dp = "DispProcessor"
    b.raw_conv(f"{dp}.spx.0", "spx", deconv=True)
    _conv2x(b, f"{dp}.spx_2", "spx_2", bn=True)
    _coex_basicconv(b, f"{dp}.spx_4.0", "spx_4a")
    b.put("params", "spx_4b/conv/conv/kernel",
          conv_kernel(b.take(f"{dp}.spx_4.1.weight")))
    b.bn(f"{dp}.spx_4.2", "spx_4b/conv")
    return b.finish()


# =========================================================================
# CFNet (reference stereo/modeling/models/cfnet/)
# =========================================================================

def _cf_resblock(b: TreeBuilder, tpre: str, fpre: str):
    """cfnet BasicBlock (submodule.py:263-288): conv1=Seq(convbn,Mish),
    conv2=convbn, optional downsample=Seq(conv,bn)."""
    b.convbn(f"{tpre}.conv1.0", f"{fpre}/conv1")
    b.convbn(f"{tpre}.conv2", f"{fpre}/conv2")
    if b.has(f"{tpre}.downsample.0.weight"):
        b.convbn(f"{tpre}.downsample", f"{fpre}/downsample")


def _cf_mish_hourglass(b: TreeBuilder, tpre: str, fpre: str):
    """cfnet hourglass (cfnet.py:222-263)."""
    for i in (1, 2, 3, 4):
        b.convbn(f"{tpre}.conv{i}.0", f"{fpre}/conv{i}")
    b.convbn(f"{tpre}.conv5", f"{fpre}/conv5", deconv=True)
    b.convbn(f"{tpre}.conv6", f"{fpre}/conv6", deconv=True)
    b.convbn(f"{tpre}.redir1", f"{fpre}/redir1")
    b.convbn(f"{tpre}.redir2", f"{fpre}/redir2")


def _cf_classif(b: TreeBuilder, tpre: str, fpre: str):
    """Seq(convbn_3d, Mish, Conv3d) head → {name}a ConvBlock + {name}b."""
    b.convbn(f"{tpre}.0", f"{fpre}a")
    b.conv(f"{tpre}.2", f"{fpre}b")


def convert_cfnet(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference cfnet.py:265-702 → models/cfnet tree."""
    b = TreeBuilder(sd)
    fe, f = "feature_extraction", "features"
    for i, t in enumerate((0, 2, 4)):
        b.convbn(f"{fe}.firstconv.{t}", f"{f}/firstconv{i}")
    for li in (2, 3, 4, 5, 6):
        _cf_resblock(b, f"{fe}.layer{li}.0", f"{f}/layer{li}")
    for i in range(4):
        b.convbn(f"{fe}.pyramid_pooling.path_module_list.{i}.cbr_unit",
                 f"{f}/psp{i}")
    for i in (6, 5, 4, 3):
        b.convbn(f"{fe}.upconv{i}.1", f"{f}/upconv{i}")
        b.convbn(f"{fe}.iconv{i - 1}.0", f"{f}/iconv{i - 1}")
    for n in (2, 3, 4, 5, 6):
        b.convbn(f"{fe}.gw{n}.0", f"{f}/gw{n}a")
        b.raw_conv(f"{fe}.gw{n}.2", f"{f}/gw{n}b")
        b.convbn(f"{fe}.concat{n}.0", f"{f}/cat{n}a")
        b.raw_conv(f"{fe}.concat{n}.2", f"{f}/cat{n}b")

    # fused-stage dres stacks: dres0/dres1 = Seq(convbn_3d, Mish)x2
    for tsuf, fpre in (("", "dres4"), ("_5", "dres5"), ("_6", "dres6")):
        b.convbn(f"dres0{tsuf}.0", f"{fpre}_0a")
        b.convbn(f"dres0{tsuf}.2", f"{fpre}_0b")
        b.convbn(f"dres1{tsuf}.0", f"{fpre}_1a")
        b.convbn(f"dres1{tsuf}.2", f"{fpre}_1b")

    # hourglassup (combine1): conv1/conv3 bare Conv3d; combine3/redir3
    # instantiated but unused in forward (cfnet.py:198-203)
    hu = "combine1"
    b.raw_conv(f"{hu}.conv1", f"{hu}/conv1")
    b.raw_conv(f"{hu}.conv3", f"{hu}/conv3")
    b.convbn(f"{hu}.combine1.0", f"{hu}/combine1")
    b.convbn(f"{hu}.combine2.0", f"{hu}/combine2")
    b.convbn(f"{hu}.conv2.0", f"{hu}/conv2")
    b.convbn(f"{hu}.conv4.0", f"{hu}/conv4")
    b.convbn(f"{hu}.conv8", f"{hu}/conv8", deconv=True)
    b.convbn(f"{hu}.conv9", f"{hu}/conv9", deconv=True)
    b.convbn(f"{hu}.redir1", f"{hu}/redir1")
    b.convbn(f"{hu}.redir2", f"{hu}/redir2")
    b.drop(f"{hu}.combine3.")
    b.drop(f"{hu}.redir3.")

    _cf_mish_hourglass(b, "dres3", "dres3")
    for s, c in (("s3", "3"), ("s2", "2")):
        b.convbn(f"confidence0_{s}.0", f"conf_{s}_0a")
        b.convbn(f"confidence0_{s}.2", f"conf_{s}_0b")
        b.convbn(f"confidence1_{s}.0", f"conf_{s}_1a")
        b.convbn(f"confidence1_{s}.2", f"conf_{s}_1b")
        _cf_mish_hourglass(b, f"confidence2_{s}", f"conf2_{s}")
        _cf_mish_hourglass(b, f"confidence3_{s}", f"conf3_{s}")
        for head in ("classif0", "classif1", "classifmid"):
            _cf_classif(b, f"confidence_{head}_{s}", f"conf_{head}_{s}")
    for head in ("classif0", "classif1", "classif2"):
        _cf_classif(b, head, head)

    for p in ("gamma_s3", "beta_s3", "gamma_s2", "beta_s2"):
        b.put("params", p, b.take(p).reshape(()))
    return b.finish()


# =========================================================================
# IINet (reference stereo/modeling/models/iinet/)
# =========================================================================

def _raw_bn(b: TreeBuilder, tkey: str, fpath: str):
    """torch BatchNorm2d → a directly-named flax nn.BatchNorm at fpath."""
    b.put("params", f"{fpath}/scale", b.take(f"{tkey}.weight"))
    b.put("params", f"{fpath}/bias", b.take(f"{tkey}.bias"))
    b.put("batch_stats", f"{fpath}/mean", b.take(f"{tkey}.running_mean"))
    b.put("batch_stats", f"{fpath}/var", b.take(f"{tkey}.running_var"))


def _iinet_basic(b: TreeBuilder, tpre: str, fpre: str):
    """IINet BasicBlock (layers.py:26-89, Identity norm → biased convs)."""
    b.raw_conv(f"{tpre}.conv1", f"{fpre}/conv1")
    b.raw_conv(f"{tpre}.conv2", f"{fpre}/conv2")
    if b.has(f"{tpre}.downsample.0.weight"):
        b.raw_conv(f"{tpre}.downsample.0", f"{fpre}/downsample")


def _iinet_mnv3(b: TreeBuilder, tpre: str, fpre: str):
    """timm mobilenetv3_large_100 sliced into IINet's 5 stage Sequentials
    (networks.py:360-371) → backbones/mobilenetv3 tree."""
    b.raw_conv(f"{tpre}.stage0.0", f"{fpre}/conv_stem")
    _raw_bn(b, f"{tpre}.stage0.1", f"{fpre}/bn1")
    # (torch stage seq, inner seq idx, timm stage, n blocks)
    layout = [("stage1", 0, 0, 1), ("stage2", 0, 1, 2), ("stage3", 0, 2, 3),
              ("stage4", 0, 3, 4), ("stage4", 1, 4, 2), ("stage5", 0, 5, 3)]
    for sname, inner, tstage, nblocks in layout:
        for j in range(nblocks):
            tp = f"{tpre}.{sname}.{inner}.{j}"
            fp = f"{fpre}/blocks_{tstage}_{j}"
            if tstage == 0:
                b.raw_conv(f"{tp}.conv_dw", f"{fp}/conv_dw")
                _raw_bn(b, f"{tp}.bn1", f"{fp}/bn1")
                b.raw_conv(f"{tp}.conv_pw", f"{fp}/conv_pw")
                _raw_bn(b, f"{tp}.bn2", f"{fp}/bn2")
                continue
            b.raw_conv(f"{tp}.conv_pw", f"{fp}/conv_pw")
            _raw_bn(b, f"{tp}.bn1", f"{fp}/bn1")
            b.raw_conv(f"{tp}.conv_dw", f"{fp}/conv_dw")
            _raw_bn(b, f"{tp}.bn2", f"{fp}/bn2")
            if b.has(f"{tp}.se.conv_reduce.weight"):
                b.raw_conv(f"{tp}.se.conv_reduce", f"{fp}/se/conv_reduce")
                b.raw_conv(f"{tp}.se.conv_expand", f"{fp}/se/conv_expand")
            b.raw_conv(f"{tp}.conv_pwl", f"{fp}/conv_pwl")
            _raw_bn(b, f"{tp}.bn3", f"{fp}/bn3")


def convert_iinet(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference iinet/iinet.py:18-120 (unet matching-encoder config)
    → models/iinet tree."""
    b = TreeBuilder(sd)

    mm, fm = "matching_model", "matching_model"
    _iinet_mnv3(b, mm, f"{fm}/trunk")
    for i in range(1, 5):
        b.raw_conv(f"{mm}.convs.up_conv{i + 1}.0", f"{fm}/up_conv{i + 1}",
                   deconv=True)
        _raw_bn(b, f"{mm}.convs.up_conv{i + 1}.1", f"{fm}/up_bn{i + 1}")
        b.raw_conv(f"{mm}.convs.in_conv{i}.0", f"{fm}/in_conv{i}")
        _raw_bn(b, f"{mm}.convs.in_conv{i}.1", f"{fm}/in_bn{i}")
        if b.has(f"{mm}.convs.out_conv{i}.0.weight"):
            b.raw_conv(f"{mm}.convs.out_conv{i}.0", f"{fm}/out_conv{i}")

    for i, t in enumerate((0, 2, 4)):
        b.dense(f"cost_volume.mlp.net.{t}", f"cost_volume/mlp_{i}")

    cv = "cost_volume_net.convs"
    _iinet_basic(b, f"{cv}.conv_0.0", "cost_volume_net/conv_0a")
    _iinet_basic(b, f"{cv}.conv_0.1", "cost_volume_net/conv_0b")
    for i in range(1, 5):
        _iinet_basic(b, f"{cv}.ds_conv_{i}", f"cost_volume_net/ds_conv_{i}")
        _iinet_basic(b, f"{cv}.conv_{i}.0", f"cost_volume_net/conv_{i}a")
        _iinet_basic(b, f"{cv}.conv_{i}.1", f"cost_volume_net/conv_{i}b")

    dd, fd = "depth_decoder", "depth_decoder"
    for i in range(4, 0, -1):
        _iinet_basic(b, f"{dd}.convs.right_conv_{i}0",
                     f"{fd}/right_conv_{i}0")
        _iinet_basic(b, f"{dd}.convs.up_conv_{i + 1}0",
                     f"{fd}/up_conv_{i + 1}0")
        _iinet_basic(b, f"{dd}.convs.in_conv_{i}1.0", f"{fd}/in_conv_{i}1a")
        _iinet_basic(b, f"{dd}.convs.in_conv_{i}1.conv_0",
                     f"{fd}/in_conv_{i}1b")
        if b.has(f"{dd}.refinenets.output_{i}.regresshead.conv1.weight"):
            tp = f"{dd}.refinenets.output_{i}"
            fp = f"{fd}/refine_{i}"
            _iinet_basic(b, f"{tp}.regresshead", f"{fp}/regresshead")
            b.raw_conv(f"{tp}.disphead.0", f"{fp}/disphead_0")
            b.raw_conv(f"{tp}.disphead.2", f"{fp}/disphead_1")
            # maskhead and mask alias the SAME module (networks.py:37-40)
            b.raw_conv(f"{tp}.maskhead.0", f"{fp}/maskhead_0")
            b.raw_conv(f"{tp}.maskhead.2", f"{fp}/maskhead_1")
            b.drop(f"{tp}.mask.")

    return b.finish()


# =========================================================================
# NMRF (reference stereo/modeling/models/nmrf/)
# =========================================================================

def _ln(b: TreeBuilder, tkey: str, fpath: str):
    b.put("params", f"{fpath}/scale", b.take(f"{tkey}.weight"))
    b.put("params", f"{fpath}/bias", b.take(f"{tkey}.bias"))


def _nmrf_mlp_head(b: TreeBuilder, tpre: str, fpre: str, n: int = 3):
    for i in range(n):
        b.dense(f"{tpre}.layers.{i}", f"{fpre}/layers_{i}")


def _nmrf_swin_nmp(b: TreeBuilder, tpre: str, fpre: str):
    """SwinNMP block (reference NMP.py:295-398)."""
    _ln(b, f"{tpre}.norm1", f"{fpre}/norm1")
    _ln(b, f"{tpre}.norm2", f"{fpre}/norm2")
    b.dense(f"{tpre}.qkv", f"{fpre}/qkv")
    b.dense(f"{tpre}.proj", f"{fpre}/proj")
    b.dense(f"{tpre}.mlp.fc1", f"{fpre}/mlp/fc1")
    b.dense(f"{tpre}.mlp.fc2", f"{fpre}/mlp/fc2")
    b.put("params", f"{fpre}/attn/relative_position_enc_table",
          b.take(f"{tpre}.attn.relative_position_enc_table"))
    b.drop(f"{tpre}.attn.relative_position_index")


def _nmrf_inference(b: TreeBuilder, tpre: str, fpre: str, n_layers: int = 5,
                    with_self: bool = True):
    b.dense(f"{tpre}.ffn.fc1", f"{fpre}/ffn/fc1")
    b.dense(f"{tpre}.ffn.fc2", f"{fpre}/ffn/fc2")
    _ln(b, f"{tpre}.norm", f"{fpre}/norm")
    for i in range(n_layers):
        if with_self:
            sp = f"{tpre}.layers.{i}.self_nmp"
            fp = f"{fpre}/layers_{i}_self_nmp"
            _ln(b, f"{sp}.norm1", f"{fp}/norm1")
            for nm in ("q", "k", "v", "proj"):
                b.dense(f"{sp}.{nm}", f"{fp}/{nm}")
        _nmrf_swin_nmp(b, f"{tpre}.layers.{i}.nmp", f"{fpre}/layers_{i}_nmp")


def _nmrf_cswin_nmp(b: TreeBuilder, tpre: str, fpre: str):
    """CSWinNMP block (reference NMP.py:508-600)."""
    _ln(b, f"{tpre}.norm1", f"{fpre}/norm1")
    _ln(b, f"{tpre}.norm2", f"{fpre}/norm2")
    for nm in ("q", "k", "v", "proj"):
        b.dense(f"{tpre}.{nm}", f"{fpre}/{nm}")
    b.dense(f"{tpre}.mlp.fc1", f"{fpre}/mlp/fc1")
    b.dense(f"{tpre}.mlp.fc2", f"{fpre}/mlp/fc2")
    for i in (0, 1):
        b.raw_conv(f"{tpre}.attns.{i}.get_v", f"{fpre}/attns_{i}/get_v")


def _nmrf_swin_trunk(b: TreeBuilder, tpre: str, fpre: str,
                     depths=(2, 2, 6, 2)):
    b.raw_conv(f"{tpre}.patch_embed.proj", f"{fpre}/patch_embed_proj")
    _ln(b, f"{tpre}.patch_embed.norm", f"{fpre}/patch_embed_norm")
    for s, depth in enumerate(depths):
        for j in range(depth):
            tp = f"{tpre}.layers.{s}.blocks.{j}"
            fp = f"{fpre}/layers_{s}_blocks_{j}"
            _ln(b, f"{tp}.norm1", f"{fp}/norm1")
            _ln(b, f"{tp}.norm2", f"{fp}/norm2")
            b.dense(f"{tp}.attn.qkv", f"{fp}/attn/qkv")
            b.dense(f"{tp}.attn.proj", f"{fp}/attn/proj")
            b.put("params", f"{fp}/attn/relative_position_bias_table",
                  b.take(f"{tp}.attn.relative_position_bias_table"))
            b.drop(f"{tp}.attn.relative_position_index")
            b.dense(f"{tp}.mlp.fc1", f"{fp}/mlp_fc1")
            b.dense(f"{tp}.mlp.fc2", f"{fp}/mlp_fc2")
        if s < len(depths) - 1:
            _ln(b, f"{tpre}.layers.{s}.downsample.norm",
                f"{fpre}/layers_{s}_downsample/norm")
            b.put("params", f"{fpre}/layers_{s}_downsample/reduction/kernel",
                  dense_kernel(b.take(f"{tpre}.layers.{s}.downsample.reduction.weight")))


def _nmrf_neck(b: TreeBuilder, tpre: str, fpre: str):
    for i, t in enumerate((0, 3, 6)):
        b.raw_conv(f"{tpre}.stem.stem.{t}", f"{fpre}/stem/stem_{i}")
    b.raw_conv(f"{tpre}.stem.fc", f"{fpre}/stem/fc")
    for i in range(4):
        _ln(b, f"{tpre}.fcs.{i}.0", f"{fpre}/fcs_{i}_norm")
        b.dense(f"{tpre}.fcs.{i}.1", f"{fpre}/fcs_{i}_linear")
        tp, fp = f"{tpre}.extractors.{i}", f"{fpre}/extractors_{i}"
        _ln(b, f"{tp}.query_norm", f"{fp}/query_norm")
        _ln(b, f"{tp}.feat_norm", f"{fp}/feat_norm")
        _ln(b, f"{tp}.ffn_norm", f"{fp}/ffn_norm")
        for nm in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj"):
            b.dense(f"{tp}.attn.{nm}", f"{fp}/attn/{nm}")
        b.dense(f"{tp}.ffn.fc1", f"{fp}/ffn/fc1")
        b.dense(f"{tp}.ffn.fc2", f"{fp}/ffn/fc2")
        b.raw_conv(f"{tp}.ffn.dwconv.dwconv", f"{fp}/ffn/dwconv")


def _nmrf_resnet(b: TreeBuilder, tpre: str, fpre: str):
    b.raw_conv(f"{tpre}.conv1", f"{fpre}/conv1")
    for li in (1, 2, 3):
        for j in (0, 1):
            tp = f"{tpre}.layer{li}.{j}"
            fp = f"{fpre}/layer{li}_{j}"
            b.raw_conv(f"{tp}.conv1", f"{fp}/conv1")
            b.raw_conv(f"{tp}.conv2", f"{fp}/conv2")
            if b.has(f"{tp}.downsample.0.weight"):
                b.raw_conv(f"{tp}.downsample.0", f"{fp}/downsample")
    b.raw_conv(f"{tpre}.conv2", f"{fpre}/conv2")


def convert_nmrf(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference NMRF.py:24-138 (+ DPN.py, NMP.py, backbone.py,
    adaptor_modules.py, swin.py) → models/nmrf tree. Detects the resnet vs
    swin encoder from the state-dict keys; handles the COMPAT naming
    ('backbone' vs 'image_encoder')."""
    b = TreeBuilder(sd)
    b.drop("device_indicator_tensor")

    enc = "image_encoder" if any(k.startswith("image_encoder")
                                 for k in b.sd) else "backbone"
    if any(k.startswith(f"{enc}.neck") for k in b.sd):  # swin adaptor
        b.drop(f"{enc}.mean")
        b.drop(f"{enc}.std")
        _nmrf_swin_trunk(b, f"{enc}.backbone", "image_encoder/backbone")
        _nmrf_neck(b, f"{enc}.neck", "image_encoder/neck")
    else:
        _nmrf_resnet(b, enc, "image_encoder")

    # shared projection stacks (NMRF.py:78-87): Sequential indices 0, 3
    for t, f in (("concatconv", "concatconv"), ("gw", "gw")):
        b.raw_conv(f"{t}.0", f"{f}/c0")
        b.raw_conv(f"{t}.3", f"{f}/c1")

    # DPN
    for i, t in enumerate((0, 2, 4)):
        b.raw_conv(f"dpn.mlp.{t}", f"dpn/mlp_{i}")
    b.raw_conv("dpn.proj.0", "dpn/proj_0")
    b.raw_conv("dpn.proj.3", "dpn/proj_1")
    b.dense("dpn.propagation.cost_encoder.0", "dpn/propagation/cost_encoder_fc1")
    b.dense("dpn.propagation.cost_encoder.2", "dpn/propagation/cost_encoder_fc2")
    b.dense("dpn.propagation.proj", "dpn/propagation/proj")
    _ln(b, "dpn.propagation.norm", "dpn/propagation/norm")
    for i in range(5):
        _nmrf_cswin_nmp(b, f"dpn.propagation.layers.{i}.nmp",
                        f"dpn/propagation/layers_{i}_nmp")
    _nmrf_mlp_head(b, "dpn.prop_head", "dpn/prop_head")

    # inference + heads
    _nmrf_inference(b, "inference", "inference", with_self=True)
    _nmrf_mlp_head(b, "infer_head", "infer_head")
    b.dense("infer_score_head", "infer_score_head")

    # refinement + head (absent when with_refinement=False)
    if any(k.startswith("refinement") for k in b.sd):
        _nmrf_inference(b, "refinement", "refinement", with_self=False)
        _nmrf_mlp_head(b, "refine_head", "refine_head")

    return b.finish()


# =========================================================================
# EdgeNeXt-small trunk (timm edgenext.py schema; FoundationStereo CNN
# branch — reference foundationstereo/core/extractor.py:321-369)
# =========================================================================

def _edgenext(b: TreeBuilder, tpre: str, fpre: str):
    b.raw_conv(f"{tpre}.stem.0", f"{fpre}/stem_conv")
    _ln(b, f"{tpre}.stem.1", f"{fpre}/stem_norm")
    depths, glob, scales = (3, 3, 9, 3), (0, 1, 1, 1), (2, 2, 3, 4)
    for s in range(4):
        sp = f"{tpre}.stages.{s}"
        if s > 0:
            _ln(b, f"{sp}.downsample.0", f"{fpre}/down{s}_norm")
            b.raw_conv(f"{sp}.downsample.1", f"{fpre}/down{s}_conv")
        n_local = depths[s] - glob[s]
        for i in range(depths[s]):
            bp = f"{sp}.blocks.{i}"
            if i < n_local:
                fp = f"{fpre}/stage{s}_block{i}"
                b.raw_conv(f"{bp}.conv_dw", f"{fp}/dwconv")
            else:
                fp = f"{fpre}/stage{s}_sdta{i - n_local}"
                for ci in range(max(1, scales[s] - 1)):
                    b.raw_conv(f"{bp}.convs.{ci}", f"{fp}/conv{ci}")
                if b.has(f"{bp}.pos_embd.token_projection.weight"):
                    w = b.take(f"{bp}.pos_embd.token_projection.weight")
                    b.put("params", f"{fp}/pos_proj/kernel",
                          dense_kernel(w[:, :, 0, 0]))
                    b.put("params", f"{fp}/pos_proj/bias",
                          b.take(f"{bp}.pos_embd.token_projection.bias"))
                _ln(b, f"{bp}.norm_xca", f"{fp}/norm_xca")
                b.put("params", f"{fp}/gamma_xca", b.take(f"{bp}.gamma_xca"))
                b.put("params", f"{fp}/xca/temperature",
                      b.take(f"{bp}.xca.temperature"))
                b.dense(f"{bp}.xca.qkv", f"{fp}/xca/qkv")
                b.dense(f"{bp}.xca.proj", f"{fp}/xca/proj")
            _ln(b, f"{bp}.norm", f"{fp}/norm")
            b.dense(f"{bp}.mlp.fc1", f"{fp}/pw1")
            b.dense(f"{bp}.mlp.fc2", f"{fp}/pw2")
            b.put("params", f"{fp}/gamma", b.take(f"{bp}.gamma"))


def convert_edgenext(sd: Dict[str, np.ndarray]) -> Dict:
    b = TreeBuilder(sd)
    _edgenext(b, "model", "model")
    return b.finish()


# =========================================================================
# DepthAnything(V2) = DINOv2 ViT + DPT head (reference
# foundationstereo/depth_anything/dpt.py + dinov2/models/vision_transformer
# — MonSter vendors the same trunk under monster/depth_anything_v2/)
# =========================================================================

def _dino_vit(b: TreeBuilder, tpre: str, fpre: str, depth: int):
    """DINOv2 trunk (torch hub dinov2_vitX14 schema) → models/backbones/
    dinov2.DinoViT."""
    b.put("params", f"{fpre}/cls_token", b.take(f"{tpre}.cls_token"))
    b.put("params", f"{fpre}/pos_embed", b.take(f"{tpre}.pos_embed"))
    b.drop(f"{tpre}.mask_token")  # masked-image-modeling only, never in eval
    b.raw_conv(f"{tpre}.patch_embed.proj", f"{fpre}/patch_embed")
    for i in range(depth):
        bp, fp = f"{tpre}.blocks.{i}", f"{fpre}/block{i}"
        _ln(b, f"{bp}.norm1", f"{fp}/norm1")
        b.dense(f"{bp}.attn.qkv", f"{fp}/attn/qkv")
        b.dense(f"{bp}.attn.proj", f"{fp}/attn/proj")
        b.put("params", f"{fp}/ls1", b.take(f"{bp}.ls1.gamma"))
        _ln(b, f"{bp}.norm2", f"{fp}/norm2")
        b.dense(f"{bp}.mlp.fc1", f"{fp}/fc1")
        b.dense(f"{bp}.mlp.fc2", f"{fp}/fc2")
        b.put("params", f"{fp}/ls2", b.take(f"{bp}.ls2.gamma"))
    _ln(b, f"{tpre}.norm", f"{fpre}/norm")


def _dpt_head(b: TreeBuilder, tpre: str, fpre: str):
    """DPTHead (reference depth_anything/dpt.py:23-106) →
    models/backbones/dpt.DPTHead."""
    for i in range(4):
        b.raw_conv(f"{tpre}.projects.{i}", f"{fpre}/project{i}")
    b.raw_conv(f"{tpre}.resize_layers.0", f"{fpre}/resize0", deconv=True)
    b.raw_conv(f"{tpre}.resize_layers.1", f"{fpre}/resize1", deconv=True)
    b.raw_conv(f"{tpre}.resize_layers.3", f"{fpre}/resize3")
    for i in range(1, 5):
        b.raw_conv(f"{tpre}.scratch.layer{i}_rn", f"{fpre}/layer{i}_rn")
    for k in range(1, 5):
        rp, fp = f"{tpre}.scratch.refinenet{k}", f"{fpre}/refinenet{k}"
        for u, fu in (("resConfUnit1", "rcu1"), ("resConfUnit2", "rcu2")):
            if k == 4 and u == "resConfUnit1":
                # refinenet4 is always called without a skip input, so its
                # resConfUnit1 exists in the torch state_dict but never runs
                # (blocks.py:133-136); the flax module doesn't create it
                b.drop(f"{rp}.{u}.")
                continue
            b.raw_conv(f"{rp}.{u}.conv1", f"{fp}/{fu}/conv1")
            b.raw_conv(f"{rp}.{u}.conv2", f"{fp}/{fu}/conv2")
        b.raw_conv(f"{rp}.out_conv", f"{fp}/out_conv")
    b.raw_conv(f"{tpre}.scratch.output_conv1", f"{fpre}/output_conv1")
    b.raw_conv(f"{tpre}.scratch.output_conv2.0", f"{fpre}/output_conv2a")
    b.raw_conv(f"{tpre}.scratch.output_conv2.2", f"{fpre}/output_conv2b")


def _dav2(b: TreeBuilder, tpre: str, fpre: str, depth: int = 12):
    _dino_vit(b, f"{tpre}.pretrained", f"{fpre}/pretrained", depth)
    _dpt_head(b, f"{tpre}.depth_head", f"{fpre}/depth_head")


def _fs_reduced(b: TreeBuilder, tpre: str, fpre: str):
    """Conv3dNormActReduced (submodule.py:87-112): biased (1,k,k) +
    (kd,1,1) convs, each BN+ReLU."""
    b.conv(f"{tpre}.conv1.0", f"{fpre}/conv_sp")
    b.bn(f"{tpre}.conv1.1", f"{fpre}/conv_sp")
    b.conv(f"{tpre}.conv2.0", f"{fpre}/conv_d")
    b.bn(f"{tpre}.conv2.1", f"{fpre}/conv_d")


def _fs_res3d(b: TreeBuilder, tpre: str, fpre: str):
    """ResnetBasicBlock3D (submodule.py:157-200, bias=False)."""
    for c in ("conv1", "conv2"):
        b.conv(f"{tpre}.{c}", f"{fpre}/{c}")
    b.bn(f"{tpre}.bn1", f"{fpre}/conv1")
    b.bn(f"{tpre}.bn2", f"{fpre}/conv2")


def _fs_res_in(b: TreeBuilder, tpre: str, fpre: str):
    """extractor.py ResidualBlock norm_fn='instance' (biased convs,
    param-free norms)."""
    b.conv(f"{tpre}.conv1", f"{fpre}/conv1")
    b.conv(f"{tpre}.conv2", f"{fpre}/conv2")


def _fs_disp_transformer(b: TreeBuilder, tpre: str, fpre: str, layers: int = 4):
    """CostVolumeDisparityAttention (submodule.py:540-564): per layer a
    FlashAttentionTransformerEncoderLayer with separate q/k/v/out projs."""
    for i in range(layers):
        sp, fp = f"{tpre}.sa.{i}", f"{fpre}/sa{i}"
        b.dense(f"{sp}.self_attn.q_proj", f"{fp}/q")
        b.dense(f"{sp}.self_attn.k_proj", f"{fp}/k")
        b.dense(f"{sp}.self_attn.v_proj", f"{fp}/v")
        b.dense(f"{sp}.self_attn.out_proj", f"{fp}/out_proj")
        b.dense(f"{sp}.linear1", f"{fp}/fc1")
        b.dense(f"{sp}.linear2", f"{fp}/fc2")
        _ln(b, f"{sp}.norm1", f"{fp}/norm1")
        _ln(b, f"{sp}.norm2", f"{fp}/norm2")


def _fs_hourglass(b: TreeBuilder, tpre: str, fpre: str):
    """FoundationStereo AHCF hourglass (foundation_stereo.py:42-124)."""
    for lvl in (1, 2, 3):
        b.conv(f"{tpre}.conv{lvl}.0.conv", f"{fpre}/conv{lvl}a")
        b.bn(f"{tpre}.conv{lvl}.0.bn", f"{fpre}/conv{lvl}a")
        _fs_reduced(b, f"{tpre}.conv{lvl}.1", f"{fpre}/conv{lvl}b")
    for name in ("conv3_up", "conv2_up", "conv1_up"):
        b.conv(f"{tpre}.{name}.conv", f"{fpre}/{name}", deconv=True)
        b.bn(f"{tpre}.{name}.bn", f"{fpre}/{name}")
    for agg, f in (("agg_0", "agg0"), ("agg_1", "agg1")):
        b.conv(f"{tpre}.{agg}.0.conv", f"{fpre}/{f}a")
        b.bn(f"{tpre}.{agg}.0.bn", f"{fpre}/{f}a")
        _fs_reduced(b, f"{tpre}.{agg}.1", f"{fpre}/{f}b")
        _fs_reduced(b, f"{tpre}.{agg}.2", f"{fpre}/{f}c")
    for t, f in (("feature_att_8", "att8"), ("feature_att_16", "att16"),
                 ("feature_att_32", "att32"), ("feature_att_up_16", "att_up16"),
                 ("feature_att_up_8", "att_up8")):
        _feature_att(b, f"{tpre}.{t}", f"{fpre}/{f}")
    b.raw_conv(f"{tpre}.conv_patch.0", f"{fpre}/conv_patch")
    _raw_bn(b, f"{tpre}.conv_patch.1", f"{fpre}/conv_patch_bn")
    _fs_disp_transformer(b, f'{tpre}.atts.4', f"{fpre}/disp_att")
    _fs_reduced(b, f"{tpre}.conv_out.0", f"{fpre}/out0")
    _fs_reduced(b, f"{tpre}.conv_out.1", f"{fpre}/out1")


def _fs_edgenext_plain(b: TreeBuilder, tpre: str, fpre: str):
    """EdgeNextConvEncoder norm=None (submodule.py:599-626)."""
    b.raw_conv(f"{tpre}.dwconv", f"{fpre}/dwconv")
    b.dense(f"{tpre}.pwconv1", f"{fpre}/pw1")
    b.dense(f"{tpre}.pwconv2", f"{fpre}/pw2")
    b.put("params", f"{fpre}/gamma", b.take(f"{tpre}.gamma"))


def _fs_selective_gru(b: TreeBuilder, tpre: str, fpre: str):
    """SelectiveConvGRU (update.py:96-117)."""
    b.raw_conv(f"{tpre}.conv0.0", f"{fpre}/conv0")
    b.raw_conv(f"{tpre}.conv1.0", f"{fpre}/conv1")
    for g in ("small_gru", "large_gru"):
        for k in ("convz", "convr", "convq"):
            b.raw_conv(f"{tpre}.{g}.{k}", f"{fpre}/{g}/{k}")


def convert_foundationstereo(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference FoundationStereo (core/foundation_stereo.py:124-264) →
    flax FoundationStereo variables. Unused reference modules (stem_4,
    context_zqr_convs, cnet.down/norm, dino mask_token) are dropped."""
    b = TreeBuilder(sd)
    # feature: EdgeNeXt trunk + frozen DAv2 + Conv2x_IN decoder + conv4
    _edgenext(b, "feature", "feature/trunk")
    _dav2(b, "feature.dino.depth_anything", "feature/dino")
    # foundation Conv2x_IN: deconv stage + RESIDUAL InstanceNorm fuse block
    # (submodule.py:383-418; norms non-affine, fuse convs bias-free)
    for name in ("deconv32_16", "deconv16_8", "deconv8_4"):
        t, f = f"feature.{name}", f"feature/{name}"
        b.conv(f"{t}.conv1.conv", f"{f}/conv1/conv", deconv=True)
        b.conv(f"{t}.conv2.conv1", f"{f}/fuse1")
        b.conv(f"{t}.conv2.conv2", f"{f}/fuse2")
    b.conv("feature.conv4.0.conv", "feature/conv4a/conv")
    _fs_res_in(b, "feature.conv4.1", "feature/conv4b")
    _fs_res_in(b, "feature.conv4.2", "feature/conv4c")
    # stems + superpixel head
    b.conv("stem_2.0.conv", "stem_2a/conv")
    b.conv("stem_2.1", "stem_2b")
    b.drop("stem_4")                      # instantiated, never called
    _conv2x(b, "spx_2_gru", "spx_2_gru", bn=False)
    b.raw_conv("spx_gru.0", "spx_gru", deconv=True)
    # volume stem + aggregation + classifier
    b.raw_conv("proj_cmb", "proj_cmb")
    b.raw_conv("corr_stem.0", "corr_stem0")
    b.conv("corr_stem.1.conv", "corr_stem1/conv")
    b.bn("corr_stem.1.bn", "corr_stem1/conv")
    _fs_res3d(b, "corr_stem.2", "corr_stem2")
    _fs_res3d(b, "corr_stem.3", "corr_stem3")
    _feature_att(b, "corr_feature_att", "corr_feature_att")
    _fs_hourglass(b, "cost_agg", "cost_agg")
    b.conv("classifier.0.conv", "classifier0/conv")
    b.bn("classifier.0.bn", "classifier0/conv")
    _fs_res3d(b, "classifier.1", "classifier1")
    b.raw_conv("classifier.2", "classifier2")
    # context net (ContextNetDino) + shared cam/sam
    _multi_basic_encoder(b, "cnet", "cnet")
    b.conv("cnet.conv2.conv", "cnet/conv2")
    b.bn("cnet.conv2.bn", "cnet/conv2")
    b.drop("cnet.down")
    b.drop("cnet.norm.")
    b.raw_conv("cam.fc.0", "cam/fc1")
    b.raw_conv("cam.fc.2", "cam/fc2")
    b.raw_conv("sam.samconv", "sam/samconv")
    b.drop("context_zqr_convs")           # instantiated, never called
    # selective update block (inside the nn.scan loop)
    up = "gru_loop/update_block"
    for k in ("convc1", "convc2", "convd1", "convd2", "conv"):
        b.raw_conv(f"update_block.encoder.{k}", f"{up}/encoder/{k}")
    for g in ("gru16", "gru08", "gru04"):
        _fs_selective_gru(b, f"update_block.{g}", f"{up}/{g}")
    b.raw_conv("update_block.disp_head.conv.0", f"{up}/disp_head/conv_in")
    _fs_edgenext_plain(b, "update_block.disp_head.conv.2", f"{up}/disp_head/enc0")
    _fs_edgenext_plain(b, "update_block.disp_head.conv.3", f"{up}/disp_head/enc1")
    b.raw_conv("update_block.disp_head.conv.4", f"{up}/disp_head/conv_out")
    b.raw_conv("update_block.mask.0", f"{up}/mask0")
    b.raw_conv("update_block.mask.2", f"{up}/mask1")
    return b.finish()


def convert_fastfoundationstereo(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference FastFoundationStereo (fast_foundationstereo/core/
    foundation_stereo.py:129-325) → flax FastFoundationStereo. Same AHCF
    stack as the teacher, EdgeNeXt-only features, single-scale shared
    context net."""
    b = TreeBuilder(sd)
    _edgenext(b, "feature", "feature/trunk")
    for name in ("deconv32_16", "deconv16_8", "deconv8_4"):
        t, f = f"feature.{name}", f"feature/{name}"
        b.conv(f"{t}.conv1.conv", f"{f}/conv1/conv", deconv=True)
        b.conv(f"{t}.conv2.conv1", f"{f}/fuse1")
        b.conv(f"{t}.conv2.conv2", f"{f}/fuse2")
    b.raw_conv("feature.conv4", "feature/conv4")
    b.conv("stem_2.0.conv", "stem_2a/conv")
    b.conv("stem_2.1", "stem_2b")
    _conv2x(b, "spx_2_gru", "spx_2_gru", bn=False)
    b.raw_conv("spx_gru.0", "spx_gru", deconv=True)
    b.raw_conv("proj_cmb", "proj_cmb")
    b.raw_conv("corr_stem.0", "corr_stem0")
    b.conv("corr_stem.1.conv", "corr_stem1/conv")
    b.bn("corr_stem.1.bn", "corr_stem1/conv")
    _fs_res3d(b, "corr_stem.2", "corr_stem2")
    _fs_res3d(b, "corr_stem.3", "corr_stem3")
    _feature_att(b, "corr_feature_att", "corr_feature_att")
    _fs_hourglass(b, "cost_agg", "cost_agg")
    b.conv("classifier.0.conv", "classifier0/conv")
    b.bn("classifier.0.bn", "classifier0/conv")
    _fs_res3d(b, "classifier.1", "classifier1")
    b.raw_conv("classifier.2", "classifier2")
    b.raw_conv("cnet.conv04.0", "cnet/conv04_net")
    b.raw_conv("cnet.conv04.1", "cnet/conv04_inp")
    b.raw_conv("cam.fc.0", "cam/fc1")
    b.raw_conv("cam.fc.2", "cam/fc2")
    b.raw_conv("sam.samconv", "sam/samconv")
    b.drop("context_zqr_convs")           # instantiated, never called
    up = "gru_loop/update_block"
    for k in ("convc1", "convc2", "convd1", "convd2", "conv"):
        b.raw_conv(f"update_block.encoder.{k}", f"{up}/encoder/{k}")
    _fs_selective_gru(b, "update_block.gru04", f"{up}/gru04")
    b.raw_conv("update_block.disp_head.conv.0", f"{up}/disp_head/conv_in")
    _fs_edgenext_plain(b, "update_block.disp_head.conv.2", f"{up}/disp_head/enc0")
    _fs_edgenext_plain(b, "update_block.disp_head.conv.3", f"{up}/disp_head/enc1")
    b.raw_conv("update_block.disp_head.conv.4", f"{up}/disp_head/conv_out")
    b.raw_conv("update_block.mask.0", f"{up}/mask0")
    b.raw_conv("update_block.mask.2", f"{up}/mask1")
    b.drop("dx")   # registered lookup-offset buffer, not a parameter
    return b.finish()


def _dpt_pyramid_decoder(b: TreeBuilder, tpre: str, fpre: str):
    """DPTHead_decoder (monster/depth_anything_v2/dpt.py:167-306): same
    reassembly as DPTHead but no output convs; refinenet4's resConfUnit1
    exists unused (single-input call)."""
    for i in range(4):
        b.raw_conv(f"{tpre}.projects.{i}", f"{fpre}/project{i}")
    b.raw_conv(f"{tpre}.resize_layers.0", f"{fpre}/resize0", deconv=True)
    b.raw_conv(f"{tpre}.resize_layers.1", f"{fpre}/resize1", deconv=True)
    b.raw_conv(f"{tpre}.resize_layers.3", f"{fpre}/resize3")
    for i in range(1, 5):
        b.raw_conv(f"{tpre}.scratch.layer{i}_rn", f"{fpre}/layer{i}_rn")
    for k in range(1, 5):
        rp, fp = f"{tpre}.scratch.refinenet{k}", f"{fpre}/refinenet{k}"
        for u, fu in (("resConfUnit1", "rcu1"), ("resConfUnit2", "rcu2")):
            if k == 4 and u == "resConfUnit1":
                b.drop(f"{rp}.{u}.")
                continue
            b.raw_conv(f"{rp}.{u}.conv1", f"{fp}/{fu}/conv1")
            b.raw_conv(f"{rp}.{u}.conv2", f"{fp}/{fu}/conv2")
        b.raw_conv(f"{rp}.out_conv", f"{fp}/out_conv")


def _monster_mix_update(b: TreeBuilder, tpre: str, fpre: str):
    """BasicMultiUpdateBlock_mix2 (monster/update.py:484-566)."""
    enc = f"{tpre}.encoder"
    for k in ("convc1", "convc2", "convc1_mono", "convc2_mono", "convd1",
              "convd2", "convd1_mono", "convd2_mono", "conv", "conv_mono"):
        b.raw_conv(f"{enc}.{k}", f"{fpre}/encoder/{k}")
    for g in ("gru04", "gru08", "gru16"):
        for k in ("convz", "convr", "convq"):
            b.raw_conv(f"{tpre}.{g}.{k}", f"{fpre}/{g}/{k}")
    b.raw_conv(f"{tpre}.disp_head.conv1", f"{fpre}/disp_head/conv1")
    b.raw_conv(f"{tpre}.disp_head.conv2", f"{fpre}/disp_head/conv2")
    b.raw_conv(f"{tpre}.mask_feat_4.0", f"{fpre}/mask_feat_4")


def _monster_conv2x_now(b: TreeBuilder, tpre: str, fpre: str,
                        deconv: bool = False):
    """Conv2x_now (monster/refinement.py:16-53): BasicConv_now pair."""
    b.conv(f"{tpre}.conv1.conv", f"{fpre}/conv1", deconv=deconv)
    b.bn(f"{tpre}.conv1.bn", f"{fpre}/conv1")
    b.conv(f"{tpre}.conv2.conv", f"{fpre}/conv2")
    b.bn(f"{tpre}.conv2.bn", f"{fpre}/conv2")


def _monster_simple_unet(b: TreeBuilder, tpre: str, fpre: str):
    """Simple_UNet (monster/refinement.py:166-222)."""
    for t in ("conv1a", "conv2a", "conv3a", "conv4a"):
        b.conv(f"{tpre}.{t}.conv", f"{fpre}/{t}")
        b.bn(f"{tpre}.{t}.bn", f"{fpre}/{t}")
    for t in ("deconv4a", "deconv3a", "deconv2a", "deconv1a",
              "deconv4b", "deconv3b", "deconv2b", "deconv1b"):
        _monster_conv2x_now(b, f"{tpre}.{t}", f"{fpre}/{t}", deconv=True)
    for t in ("conv1b", "conv2b", "conv3b", "conv4b"):
        _monster_conv2x_now(b, f"{tpre}.{t}", f"{fpre}/{t}")


def _monster_remp(b: TreeBuilder, tpre: str = "REMP", fpre: str = "REMP"):
    """REMP (monster/refinement.py:363-431)."""
    for t in ("conv1_mono", "conv1_stereo", "conv2_mono", "conv2_stereo"):
        b.conv(f"{tpre}.{t}.0", f"{fpre}/{t}")
        b.bn(f"{tpre}.{t}.1", f"{fpre}/{t}")
    b.conv(f"{tpre}.conv_start.conv", f"{fpre}/conv_start")
    b.bn(f"{tpre}.conv_start.bn", f"{fpre}/conv_start")
    _monster_simple_unet(b, f"{tpre}.RefinementBlock", f"{fpre}/unet")
    b.raw_conv(f"{tpre}.LFE.0", f"{fpre}/lfe1")
    b.raw_conv(f"{tpre}.LFE.2", f"{fpre}/lfe2")
    b.raw_conv(f"{tpre}.LMC.0", f"{fpre}/lmc1")
    b.raw_conv(f"{tpre}.LMC.1", f"{fpre}/lmc2")
    b.raw_conv(f"{tpre}.LMC.3", f"{fpre}/lmc3")
    b.raw_conv(f"{tpre}.final_conv", f"{fpre}/final_conv")


def convert_monster(sd: Dict[str, np.ndarray], vit_depth: int = 12) -> Dict:
    """Reference MonSter (monster/monster.py:216-540) → flax MonSter."""
    b = TreeBuilder(sd)
    # frozen mono branch + trainable pyramid decoder
    _dino_vit(b, "mono_encoder", "mono/mono_encoder", vit_depth)
    _dpt_head(b, "mono_decoder", "mono/mono_decoder")
    b.drop("mono_decoder.scratch.refinenet4.resConfUnit1.")
    _dpt_pyramid_decoder(b, "feat_decoder", "mono/feat_decoder")
    # feature transfer into the stereo pyramid + context
    ft = "feat_transfer"
    for t, f in (("conv4x", "conv4x"), ("conv8x", "conv8x"),
                 ("conv16x", "conv16x"), ("conv32x", "conv32x")):
        b.conv(f"{ft}.{t}.0", f"{ft}/{f}")
    for t, f in (("conv_up_32x", "up32"), ("conv_up_16x", "up16"),
                 ("conv_up_8x", "up8")):
        b.raw_conv(f"{ft}.{t}", f"{ft}/{f}/deconv", deconv=True)
    for t, f in (("res_16x", "res16x"), ("res_8x", "res8x"),
                 ("res_4x", "res4x")):
        b.raw_conv(f"{ft}.{t}", f"{ft}/{f}")
    for t in ("res_16x", "res_8x", "res_4x"):
        b.raw_conv(f"feat_transfer_cnet.{t}", f"feat_transfer_cnet/{t}")
    # stems
    for s in ("stem_2", "stem_4", "stem_8", "stem_16"):
        b.conv(f"{s}.0.conv", f"{s}a/conv")
        b.conv(f"{s}.1", f"{s}b")
    # superpixel heads (init-disp supervision + GRU upsample)
    b.conv("spx_4.0.conv", "spx_4a/conv")
    b.conv("spx_4.1", "spx_4b")
    _conv2x(b, "spx_2", "spx_2", bn=False)
    b.raw_conv("spx.0", "spx", deconv=True)
    _conv2x(b, "spx_2_gru", "spx_2_gru", bn=True)
    b.raw_conv("spx_gru.0", "spx_gru", deconv=True)
    # matching + volume + aggregation
    b.conv("conv.conv", "conv/conv")
    b.raw_conv("desc", "desc")
    b.conv("corr_stem.conv", "corr_stem/conv")
    b.bn("corr_stem.bn", "corr_stem/conv")
    _feature_att(b, "corr_feature_att", "corr_feature_att")
    # hourglass: flax MonsterHourglass uses bare ConvBlocks (no BasicConvBN
    # nesting like IGEV's GeoHourglass), so paths are one level shallower
    hg = "cost_agg"
    for t, f in (("conv1.0", "conv1a"), ("conv1.1", "conv1b"),
                 ("conv2.0", "conv2a"), ("conv2.1", "conv2b"),
                 ("conv3.0", "conv3a"), ("conv3.1", "conv3b"),
                 ("agg_0.0", "agg0a"), ("agg_0.1", "agg0b"),
                 ("agg_0.2", "agg0c"), ("agg_1.0", "agg1a"),
                 ("agg_1.1", "agg1b"), ("agg_1.2", "agg1c")):
        b.conv(f"{hg}.{t}.conv", f"{hg}/{f}")
        b.bn(f"{hg}.{t}.bn", f"{hg}/{f}")
    for t in ("conv3_up", "conv2_up"):
        b.conv(f"{hg}.{t}.conv", f"{hg}/{t}", deconv=True)
        b.bn(f"{hg}.{t}.bn", f"{hg}/{t}")
    b.conv(f"{hg}.conv1_up.conv", f"{hg}/conv1_up", deconv=True)
    b.drop(f"{hg}.conv1_up.bn")   # bn=False — instantiated, unused
    for t, f in (("feature_att_8", "att8"), ("feature_att_16", "att16"),
                 ("feature_att_32", "att32"),
                 ("feature_att_up_16", "att_up16"),
                 ("feature_att_up_8", "att_up8")):
        _feature_att(b, f"{hg}.{t}", f"{hg}/{f}")
    b.raw_conv("classifier", "classifier")
    # GRU machinery: phase A + twin mix blocks
    for i in range(3):
        b.raw_conv(f"context_zqr_convs.{i}", f"context_zqr{i}")
    _update_block(b, "update_block", "gru_loop/update_block")
    _monster_mix_update(b, "update_block_mix_stereo",
                        "gru_loop_mix/update_mix_stereo")
    _monster_mix_update(b, "update_block_mix_mono",
                        "gru_loop_mix/update_mix_mono")
    _monster_remp(b)
    return b.finish()


def convert_depth_anything(sd: Dict[str, np.ndarray], depth: int = 12) -> Dict:
    """Standalone DepthAnythingV2 checkpoint (keys ``pretrained.*`` /
    ``depth_head.*``) → backbones/dpt.DepthAnythingV2 variables (trunk
    depth 12 for vits/vitb, 24 for vitl)."""
    b = TreeBuilder(sd)
    _dino_vit(b, "pretrained", "pretrained", depth)
    _dpt_head(b, "depth_head", "depth_head")
    return b.finish()


CONVERTERS: Dict[str, Callable[[Dict[str, np.ndarray]], Dict]] = {
    "PSMNet": convert_psmnet,
    "GwcNet": convert_gwcnet,
    "MSNet3D": convert_msnet3d,
    "MSNet2D": convert_msnet2d,
    "TimmMobileNetV2": convert_timm_mobilenetv2,
    "LightStereo": convert_lightstereo,
    "STTR": convert_sttr,
    "CasPSMNet": convert_casnet,
    "CasGwcNet": convert_casnet,
    "IGEV": convert_igev,
    "IGEVRT": convert_igev_rt,
    "IGEVPP": convert_igevpp,
    "StereoBase": convert_stereobase,
    "StereoBaseGRU": convert_stereobase,
    "NMRF": convert_nmrf,
    "CFNet": convert_cfnet,
    "CoExNet": convert_coex,
    "FADNet": convert_fadnet,
    "AANet": convert_aanet,
    "CoEx": convert_coex,
    "IINet": convert_iinet,
    "EdgeNeXt": convert_edgenext,
    "DepthAnything": convert_depth_anything,
    "FoundationStereo": convert_foundationstereo,
    "MonSter": convert_monster,
    "FastFoundationStereo": convert_fastfoundationstereo,
}


def nest_tree(variables: Dict, prefix: str) -> Dict:
    """Nest {'params','batch_stats'} collections under a path like
    'backbone/trunk' so partial_load lands them at the right absolute
    position in a full model tree."""
    if not prefix:
        return variables
    out = {}
    for coll, tree in variables.items():
        if not tree:
            continue
        for part in reversed(prefix.strip("/").split("/")):
            tree = {part: tree}
        out[coll] = tree
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth checkpoint → flat numpy state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state" in obj:
        obj = obj["model_state"]
    out = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def convert(model_name: str, state_dict: Dict[str, np.ndarray]) -> Dict:
    if model_name not in CONVERTERS:
        raise KeyError(
            f"no converter for {model_name!r}; available: {sorted(CONVERTERS)}")
    return CONVERTERS[model_name](state_dict)
