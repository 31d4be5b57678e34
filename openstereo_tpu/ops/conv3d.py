"""Fast NDHWC 3D convolution for TPU: one batched 2D convolution with the
depth taps merged into the output-channel dimension, then a static
shift-add over depth.

Why: XLA's native Conv3D lowering on TPU reaches ~12 TFLOP/s on the
cost-volume shapes the stereo models use (e.g. [1,48,136,240,64]→32,
k=3³) because the 32-wide output channel dim fills a quarter of the MXU's
128 lanes and the D dimension is walked serially. Folding D into the
batch and stacking the KD depth taps along output channels turns the same
contraction into a single 2D convolution with KD× wider output (96 lanes
for KD=3, COUT=32) — measured 2.5× faster (14.1 ms → 5.7 ms) at identical
FLOPs. The depth reduction then becomes KD static strided slices and adds,
which XLA fuses.

Drop-in for the models' 3D ConvBlocks (reference 3D conv usage:
stereo/modeling/common/basic_block_3d.py:5-41 and every cost-aggregation
hourglass); the module below exposes the exact parameter tree of
`flax.linen.Conv` so checkpoints and the torch converter are unaffected.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3d_tap_merged(
    x: jax.Array,
    kernel: jax.Array,
    strides: Sequence[int] = (1, 1, 1),
    padding: Sequence[Tuple[int, int]] = ((1, 1), (1, 1), (1, 1)),
    dilation: Sequence[int] = (1, 1, 1),
    groups: int = 1,
) -> jax.Array:
    """NDHWC conv3d via D→batch folding + tap-merged conv2d.

    x: [B, D, H, W, Cin]; kernel: [KD, KH, KW, Cin//groups, Cout]
    (flax nn.Conv layout). Returns [B, Do, Ho, Wo, Cout].

    Depth handling by case, all at exact FLOPs (policy measured on-chip,
    see docs/BENCHMARKS.md):
    - kd == 1 (pointwise-in-depth): native — already a pure contraction;
    - non-overlapping depth windows (sd == kd, no depth pad): depth block
      folds into input channels — one conv2d with KD·Cin inputs;
    - sd == 1 dense: one conv2d with the KD taps merged into output
      channels + static shift-adds over depth (the winning case);
    - strided-overlapping depth (sd > 1, sd != kd): native — the residue
      split costs more than the channel widening buys.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, cin_g, cout = kernel.shape
    sd, sh, sw = strides
    dd, dh, dw_ = dilation
    (pd0, pd1), ph, pw = padding[0], padding[1], padding[2]

    def conv2d(xb, wk):
        return jax.lax.conv_general_dilated(
            xb, wk, (sh, sw), (ph, pw), rhs_dilation=(dh, dw_),
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    do = (d + pd0 + pd1 - (dd * (kd - 1) + 1)) // sd + 1

    if kd == 1 and sd == 1:
        # spatial-only conv at shallow width: fold D into batch — ONE 2D
        # conv over B·D images. Measured 6.75 → 2.99 ms at [48,136,240,28]
        # (FFS AHCF's 1x3x3 stage); at C ≥ ~112 the native Conv3D walk is
        # on par or better, and for 1x1x1 pointwise convs folding breaks
        # the producer/consumer fusion XLA picked for the surrounding 3D
        # ops (measured 84 ms → 134 ms on MSNet3D's MobileV2 pw convs).
        if (kh > 1 or kw > 1) and cin <= 64 and d > 1:
            xb = x.reshape(b * d, h, w, cin)
            o = conv2d(xb, kernel.reshape(kh, kw, cin_g, cout))
            return o.reshape(b, d, o.shape[1], o.shape[2], cout)
        return jax.lax.conv_general_dilated(
            x, kernel, (1, sh, sw), (padding[0], ph, pw),
            rhs_dilation=(1, dh, dw_), feature_group_count=groups,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    if kh == 1 and kw == 1 and sh == 1 and sw == 1:
        # pure depth-axis conv (FastFoundationStereo's AHCF 17x1x1
        # disparity filters, blocks.py DWConv): fold H,W into ONE spatial
        # axis and run a [KD,1] 2D conv. The tap-merged form materializes
        # a KD-times-wider pre-reduction volume (1.5 GB at kd=17 on the
        # level-0 volume) plus KD shift-adds — measured 16.3 ms vs 4.9 ms
        # folded at [1,48,136,240,28]; native Conv3D also loses (6.0 ms).
        xr = x.reshape(b, d, h * w, cin)
        wk = kernel.reshape(kd, 1, cin_g, cout)
        o = jax.lax.conv_general_dilated(
            xr, wk, (sd, 1), (padding[0], (0, 0)), rhs_dilation=(dd, 1),
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return o.reshape(b, o.shape[1], h, w, cout)

    if sd == kd and dd == 1 and pd0 == 0 and pd1 == 0 and d % kd == 0 \
            and groups == 1:
        # exact depth-to-channel: fold each depth window into channels
        xr = x.reshape(b, do, kd, h, w, cin)
        xr = xr.transpose(0, 1, 3, 4, 2, 5).reshape(b * do, h, w, kd * cin)
        wk = kernel.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * cin_g, cout)
        o = conv2d(xr, wk)
        return o.reshape(b, do, o.shape[1], o.shape[2], cout)

    if sd > 1 and dd == 1 and groups == 1:
        # Polyphase depth split — exact FLOPs for strided-overlapping depth
        # (the hourglass downsampling convs: kd=3, sd=2, pd=1). Naive
        # tap-merging at sd>1 wastes sd× FLOPs (every (depth, tap) pair is
        # computed but only 1/sd are consumed — measured 0.7× vs native,
        # the old fallback). Instead group taps by the congruence class of
        # the input depth they read: output od reads input j = sd·od+t-pd0,
        # so tap t only ever touches depths j ≡ (t-pd0) (mod sd). Each
        # phase r gets ONE folded conv2d over x[:, r::sd] with its taps
        # merged into output channels, then static shift-adds — no wasted
        # work, and the contraction stays a wide 2D conv on the MXU.
        ho = (h + ph[0] + ph[1] - (dh * (kh - 1) + 1)) // sh + 1
        wo = (w + pw[0] + pw[1] - (dw_ * (kw - 1) + 1)) // sw + 1
        # accumulate cross-tap partial sums in f32 (matches the native
        # lowering, which carries the full kd·kh·kw·Cin contraction in f32)
        acc_dtype = jnp.promote_types(jnp.float32, x.dtype)
        y = jnp.zeros((b, do, ho, wo, cout), acc_dtype)
        for r in range(sd):
            taps = [t for t in range(kd) if (t - pd0) % sd == r]
            xp = x[:, r::sd]
            dp = xp.shape[1]
            if not taps or dp == 0:
                continue
            xb = xp.reshape(b * dp, h, w, cin)
            wk = jnp.stack([kernel[t] for t in taps])  # [T,KH,KW,Cin,Cout]
            wk = wk.transpose(1, 2, 3, 0, 4).reshape(kh, kw, cin_g, len(taps) * cout)
            o = conv2d(xb, wk).reshape(b, dp, ho, wo, len(taps), cout)
            for ti, t in enumerate(taps):
                m = (t - pd0 - r) // sd  # phase index i feeds od = i - m
                i_lo = max(0, m)
                i_hi = min(dp - 1, do - 1 + m)
                if i_lo > i_hi:
                    continue
                y = y.at[:, i_lo - m:i_hi - m + 1].add(
                    o[:, i_lo:i_hi + 1, :, :, ti].astype(acc_dtype))
        return y.astype(x.dtype)

    # tap-merge wins only for stride-1 depth; guard the ≤ KD tap copies of
    # the pre-reduction volume against HBM (see docs/BENCHMARKS.md).
    inter_bytes = b * d * h * w * kd * cout * x.dtype.itemsize
    if sd != 1 or inter_bytes > 4 << 30:
        return jax.lax.conv_general_dilated(
            x, kernel, (sd, sh, sw), (padding[0], ph, pw),
            rhs_dilation=(dd, dh, dw_), feature_group_count=groups,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    if cin <= 8 and groups == 1 and dd == 1:
        # narrow-input dense depth conv (IGEV/IGEV-RT hourglass at the
        # 8-channel geo volume): merge the depth taps on the INPUT side —
        # kd shifted copies concat along channels, one conv2d, no
        # pre-reduction intermediate and no shift-adds. Measured
        # 10.8 → 2.4 ms at [1,48,136,240,8]; at cin ≥ 16 the kd× input
        # blow-up loses to the output-side tap merge below.
        zp = jnp.pad(x, ((0, 0), (pd0, pd1), (0, 0), (0, 0), (0, 0)))
        xw = jnp.concatenate([zp[:, t:t + do] for t in range(kd)], axis=-1)
        wk = kernel.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * cin, cout)
        o = conv2d(xw.reshape(b * do, h, w, kd * cin), wk)
        return o.reshape(b, do, o.shape[1], o.shape[2], cout)

    # sd == 1 tap-merged path
    cout_g = cout // groups
    xb = x.reshape(b * d, h, w, cin)
    # out channels group-major for feature_group_count: (G, taps, CG)
    wk = kernel.reshape(kd, kh, kw, cin_g, groups, cout_g)
    wk = wk.transpose(1, 2, 3, 4, 0, 5).reshape(
        kh, kw, cin_g, groups * kd * cout_g)
    o = conv2d(xb, wk)
    ho, wo = o.shape[1], o.shape[2]
    if groups == 1:
        o = o.reshape(b, d, ho, wo, kd, cout)
    else:
        # conv output channels are (G, KD, CG)-ordered; COUT is (G, CG)
        o = o.reshape(b, d, ho, wo, groups, kd, cout_g)
        o = o.transpose(0, 1, 2, 3, 5, 4, 6).reshape(b, d, ho, wo, kd, cout)
    y = jnp.zeros((b, do, ho, wo, cout), o.dtype)
    for t in range(kd):
        # input depth j feeds output od = j + pd0 - t·dd
        c = pd0 - t * dd
        j_lo = max(0, -c)
        j_hi = min(d - 1, do - 1 - c)
        if j_lo > j_hi:
            continue
        y = y.at[:, c + j_lo:c + j_hi + 1].add(o[:, j_lo:j_hi + 1, :, :, t])
    return y


def conv3d_transpose_tap_merged(
    x: jax.Array,
    kernel: jax.Array,
    strides: Sequence[int] = (2, 2, 2),
    padding: Sequence[Tuple[int, int]] = ((1, 2), (1, 2), (1, 2)),
) -> jax.Array:
    """NDHWC transposed conv3d via D→batch folding + tap-merged 2D
    transposed conv, then a static strided scatter-add over depth.

    Semantics match `jax.lax.conv_transpose` (flax ConvTranspose, no
    kernel mirroring): y[od] = Σ_kd w[kd]·xp[od+kd] with xp the
    zero-stuffed input padded by `padding`. Measured 1.46× vs the native
    ConvTranspose3D lowering on the hourglass deconv shapes
    (4.59 ms → 3.15 ms at [1,24,68,120,64]→32, k=3³, s=2).

    kernel: [KD, KH, KW, Cin, Cout] (flax layout). Returns
    [B, Do, Ho, Wo, Cout] with Do = sd·(D-1)+1+pd0+pd1-KD+1.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    sd, sh, sw = strides
    (pd0, pd1) = padding[0]

    xb = x.reshape(b * d, h, w, cin)
    wk = jnp.moveaxis(kernel, 0, -2).reshape(kh, kw, cin, kd * cout)
    o = jax.lax.conv_transpose(
        xb, wk, (sh, sw), (tuple(padding[1]), tuple(padding[2])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = o.shape[1], o.shape[2]
    o = o.reshape(b, d, ho, wo, kd, cout)

    do = sd * (d - 1) + 1 + pd0 + pd1 - kd + 1
    y = jnp.zeros((b, do, ho, wo, cout), o.dtype)
    # input depth i contributes tap t to output depth od = sd·i + pd0 - t
    for t in range(kd):
        start = pd0 - t
        d_lo = 0 if start >= 0 else (-start + sd - 1) // sd
        d_hi = min(d - 1, (do - 1 - start) // sd)
        if d_lo > d_hi:
            continue
        od0 = sd * d_lo + start
        od1 = sd * d_hi + start
        y = y.at[:, od0:od1 + 1:sd].add(o[:, d_lo:d_hi + 1, :, :, t])
    return y


class Conv3DTapMerged(nn.Module):
    """flax.linen.Conv-compatible 3D convolution using the tap-merged path.

    Parameter tree matches nn.Conv exactly (`kernel` [KD,KH,KW,Cin/G,Cout],
    optional `bias` [Cout]) so it is checkpoint- and converter-compatible.

    Note: padding="SAME" resolves to torch-style *symmetric* padding
    p = d*(k-1)//2 per dim (the convention every model in this repo uses),
    which differs from flax nn.Conv's XLA SAME for even kernels or
    stride>1 (XLA pads asymmetrically). Pass explicit pairs to get any
    other convention.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: Any = "SAME"
    kernel_dilation: Sequence[int] = (1, 1, 1)
    feature_group_count: int = 1
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kd, kh, kw, cin // self.feature_group_count, self.features),
            jnp.float32)
        padding = self.padding
        if padding == "SAME":
            padding = [((k - 1) * dil // 2,) * 2 for k, dil in
                       zip(self.kernel_size, self.kernel_dilation)]
        elif padding == "VALID":
            padding = [(0, 0)] * 3
        dtype = self.dtype or x.dtype
        if self.feature_group_count == 1:
            y = conv3d_tap_merged(
                x.astype(dtype), kernel.astype(dtype),
                strides=tuple(self.strides), padding=tuple(padding),
                dilation=tuple(self.kernel_dilation))
        else:
            # grouped/depthwise 3D convs run on the VPU, not the MXU — the
            # tap-merged lowering's channel reorder costs more than it saves
            # (MSNet3D: 75 ms → 162 ms with it). Use the native lowering.
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                tuple(self.strides), tuple(padding),
                rhs_dilation=tuple(self.kernel_dilation),
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class ConvTranspose3DTapMerged(nn.Module):
    """flax.linen.ConvTranspose-compatible 3D transposed convolution using
    the fold+tap-merged path. Parameter tree matches nn.ConvTranspose
    (`kernel` [KD,KH,KW,Cin,Cout], optional `bias`). Requires explicit
    padding pairs (the hourglass deconvs use ((k-2, k-1),)·3)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (2, 2, 2)
    padding: Any = ((1, 2), (1, 2), (1, 2))
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kd, kh, kw, cin, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = conv3d_transpose_tap_merged(
            x.astype(dtype), kernel.astype(dtype),
            strides=tuple(self.strides), padding=tuple(self.padding))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y
