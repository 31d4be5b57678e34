"""Shared NN building blocks (flax.linen, NHWC).

TPU-native equivalents of the reference conv wrappers
(reference: stereo/modeling/common/basic_block_2d.py:6-41, basic_block_3d.py:5-41)
and the MobileNetV2 residual used by LightStereo/CoEx/MSNet aggregators
(reference: stereo/modeling/models/lightstereo/aggregation.py:67-105).

Conventions:
- layouts NHWC (2D) / NDHWC (3D); channels ride the 128-lane dimension.
- BatchNorm carries running stats in the 'batch_stats' collection. Under jit
  with a batch sharded over the mesh 'data' axis, batch-stat reductions are
  global, so cross-replica SyncBN (reference trainer_template.py:76-78) falls
  out of the compilation model for free.
- `dtype` is the compute dtype (bf16 for AMP-equivalent training); params stay
  float32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import Conv3DTapMerged, ConvTranspose3DTapMerged

Dtype = Any

# 3D (de)conv lowering selection, resolved at TRACE time per ConvBlock:
#   1. OPENSTEREO_CONV3D / OPENSTEREO_DECONV3D env vars (session-wide
#      escape hatch, strongest);
#   2. a model-scoped `impl3d_default(...)` pin (models whose measured
#      winner differs from the global default wrap their __call__);
#   3. the global default "tap" (ops/conv3d.py policy).
# The XLA toolchain behind the remote chip evolves: the round-4 sweep had
# tap-merged winning GwcNet/CoEx/CasNet by 15-20%, the round-5 end sweep
# has the native Conv3D walk winning those same models by 15-38% while
# PSMNet/MSNet2D still prefer tap. Per-model pins record the measured
# winner (docs/BENCHMARKS.md "lowering re-sweep"); the env vars override
# everything for re-measurement.
import os as _os
from contextlib import contextmanager as _contextmanager
from contextvars import ContextVar as _ContextVar

_conv3d_pin: "_ContextVar[str | None]" = _ContextVar("conv3d_pin", default=None)
_deconv3d_pin: "_ContextVar[str | None]" = _ContextVar("deconv3d_pin", default=None)


@_contextmanager
def impl3d_default(conv: str = None, deconv: str = None):
    """Model-scoped 3D-conv lowering pin (trace-time; env vars still win).

    No-op on the CPU backend: the pins encode measured TPU winners, and
    XLA-CPU compiles native Conv3D ~60× slower than the folded 2D forms
    (2 min per small-shape GwcNet init), which would dominate the CPU
    test suite for zero numerical difference.
    """
    import jax

    if jax.default_backend() == "cpu":
        conv = deconv = None
    tc = _conv3d_pin.set(conv) if conv else None
    td = _deconv3d_pin.set(deconv) if deconv else None
    try:
        yield
    finally:
        if tc is not None:
            _conv3d_pin.reset(tc)
        if td is not None:
            _deconv3d_pin.reset(td)


def pin_impl3d(conv: str = None, deconv: str = None):
    """Decorator form of `impl3d_default` for a model's ``__call__``.

    Place UNDER ``@nn.compact`` so flax sees the wrapped method:

        @nn.compact
        @pin_impl3d("native", "native")
        def __call__(self, data, *, train=False): ...
    """
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **k):
            with impl3d_default(conv, deconv):
                return fn(*a, **k)
        return wrapped
    return deco


def _conv3d_impl() -> str:
    return (_os.environ.get("OPENSTEREO_CONV3D")
            or _conv3d_pin.get() or "tap")


def _deconv3d_impl() -> str:
    return (_os.environ.get("OPENSTEREO_DECONV3D")
            or _deconv3d_pin.get() or "tap")




def head_dtype(dtype) -> Dtype:
    """Dtype for softmax/regression heads: at least f32 (bf16 compute is
    upcast for numerically sensitive reductions), but follows wider module
    dtypes (f64 parity tests)."""
    return jnp.promote_types(jnp.float32, dtype)


def leaky_relu(negative_slope: float = 0.01) -> Callable:
    return partial(nn.leaky_relu, negative_slope=negative_slope)


def siamese(fn: Callable, left, right):
    """Run a weight-shared (siamese) tower over a stereo pair as ONE
    batched call: concat on the batch axis → single pass → split.

    One 2B-batch pass loads every layer's weights from HBM once instead of
    twice and halves op-dispatch overhead — the feature towers are
    bandwidth-bound at inference batch sizes. With BatchNorm in inference
    mode (running stats) the numerics are equivalent to two separate calls
    (all eval-mode ops are per-sample; no batch-statistic coupling), though
    XLA may tile the 2B-batch program differently so bf16 results are not
    guaranteed bit-exact. Models use this for their eval path; the train
    path keeps two calls to preserve the reference's per-view BN batch
    statistics (reference runs backbone(left) / backbone(right) as separate
    forwards, e.g. stereo/modeling/models/lightstereo/lightstereo.py:46-47).

    `fn` may return an arbitrary pytree of arrays (e.g. a feature-pyramid
    list); each leaf is split back into (left, right) halves.
    """
    b = left.shape[0]
    out = fn(jnp.concatenate([left, right], axis=0))
    return (jax.tree.map(lambda t: t[:b], out),
            jax.tree.map(lambda t: t[b:], out))


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _pair(v, n=2):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


class ConvBlock(nn.Module):
    """Conv + optional norm + optional activation (NHWC or NDHWC).

    norm: None | 'batch' | 'instance' | 'group' | 'layer'.
    Matches reference BasicConv2d/BasicConv3d semantics: bias off by default,
    InstanceNorm is non-affine (torch nn.InstanceNorm2d default).
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int, Sequence[Tuple[int, int]]] = "SAME"
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[Callable] = None
    pad_mode: str = "zeros"  # 'zeros' | 'replicate' (reference padding_mode)
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        ks = _pair(self.kernel_size, self.ndim)
        st = _pair(self.strides, self.ndim)
        dil = _pair(self.dilation, self.ndim)
        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding)] * self.ndim
        if padding == "SAME":
            # torch-style symmetric padding p = d·(k-1)/2.  XLA's SAME pads
            # asymmetrically ((0,1)) for stride-2 convs, which shifts the
            # output half a pixel relative to every reference model — use the
            # torch convention so converted checkpoints match exactly
            # (validated in tests/test_reference_parity.py)
            padding = [(d * (k - 1) // 2,) * 2 for k, d in zip(ks, dil)]

        if self.pad_mode == "replicate" and padding != "VALID":
            # explicit edge-pad then VALID conv
            x = jnp.pad(x, [(0, 0)] + [tuple(p) for p in padding] + [(0, 0)], mode="edge")
            padding = "VALID"

        if self.ndim == 3 and _conv3d_impl() != "native":
            # XLA's native Conv3D walks D serially and underfills the MXU on
            # the narrow-channel cost volumes; the tap-merged lowering is
            # ~2.5× faster at identical FLOPs (see ops/conv3d.py). Parameter
            # tree is identical to nn.Conv.
            x = Conv3DTapMerged(
                self.features, ks, strides=st, padding=padding,
                kernel_dilation=dil, feature_group_count=self.groups,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features, ks, strides=st, padding=padding,
                kernel_dilation=dil, feature_group_count=self.groups,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        x = apply_norm(self, x, train)
        if self.act is not None:
            x = self.act(x)
        return x


class DeconvBlock(nn.Module):
    """Transposed conv + optional norm + act.

    The reference uses two spatial-doubling deconvs: ConvTranspose(k=4, s=2,
    p=1) and ConvTranspose(k=3, s=2, p=1, output_padding=1).  Both produce
    out = 2·in, but their output pixel alignment differs; the flax paddings
    that reproduce torch's values exactly (validated in
    tests/test_layer_parity.py) are SAME for even k and ((k-2, k-1), ...)
    for odd k.  Weight conversion from torch additionally mirrors the kernel
    spatially (torch's deconv is gradient-of-conv; flax's default is a
    fractionally-strided conv) — see utils/torch_convert.deconv_kernel.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 4
    strides: Union[int, Sequence[int]] = 2
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[Callable] = None
    ndim: int = 2
    # 3D lowering: None → env default (tap). Models whose deconvs sit
    # between native-lowered 3D ops (MobileV2Residual3D stacks) should pin
    # "native" to avoid layout round-trips at the folded-2D boundary.
    impl3d: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        ks = _pair(self.kernel_size, self.ndim)
        st = _pair(self.strides, self.ndim)
        padding = "SAME" if ks[0] % 2 == 0 else tuple(
            (k - 2, k - 1) for k in ks)
        impl = self.impl3d or _deconv3d_impl()
        if self.ndim == 3 and padding != "SAME" and impl != "native":
            # fold-D + tap-merged transposed conv — 1.46× vs XLA's native
            # ConvTranspose3D on the hourglass shapes (see ops/conv3d.py);
            # parameter tree identical to nn.ConvTranspose.
            x = ConvTranspose3DTapMerged(
                self.features, ks, strides=st, padding=padding,
                use_bias=self.use_bias, dtype=self.dtype, name="deconv",
            )(x)
        else:
            x = nn.ConvTranspose(
                self.features, ks, strides=st, padding=padding,
                use_bias=self.use_bias, dtype=self.dtype, name="deconv",
            )(x)
        x = apply_norm(self, x, train)
        if self.act is not None:
            x = self.act(x)
        return x


def apply_norm(mod: nn.Module, x, train: bool):
    """Shared norm dispatch for ConvBlock/DeconvBlock.

    BatchNorm uses batch statistics only when training AND the 'batch_stats'
    collection is mutable in this apply. Calling apply with `mutable=[]`
    (or without batch_stats) therefore freezes BN — the reference's FREEZE_BN
    (stereo/utils/common_utils.py:114-139) without threading an extra flag
    through every module.
    """
    if mod.norm is None:
        return x
    if mod.norm == "batch":
        use_ra = (not train) or (not mod.is_mutable_collection("batch_stats"))
        return nn.BatchNorm(
            use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
            dtype=mod.dtype, name="bn",
        )(x)
    if mod.norm == "instance":
        # torch nn.InstanceNorm2d default: non-affine, eps=1e-5
        return nn.GroupNorm(
            num_groups=None, group_size=1, epsilon=1e-5,
            use_bias=False, use_scale=False, dtype=mod.dtype, name="in",
        )(x)
    if mod.norm == "layer":
        return nn.LayerNorm(dtype=mod.dtype, name="ln")(x)
    raise ValueError(f"unknown norm {mod.norm!r}")


class MobileV2Residual3D(nn.Module):
    """3D inverted "residual" (reference: msnet/submodule.py:135-173), NDHWC.

    NOTE: the reference checks ``stride == (1, 1, 1)`` while every caller
    passes an int (MSNet3D.py:16-33,64-69), so its residual connection is
    NEVER taken.  We reproduce that behavior exactly — checkpoint and
    training parity depend on it — hence no skip connection here.
    """

    features: int
    strides: int = 1
    expanse_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        hidden = round(inp * self.expanse_ratio)
        use_res = False
        y = ConvBlock(hidden, 1, norm="batch", act=relu6, ndim=3,
                      dtype=self.dtype, name="pw")(x, train=train)
        y = ConvBlock(hidden, 3, strides=self.strides, groups=hidden, norm="batch",
                      act=relu6, ndim=3, dtype=self.dtype, name="dw")(y, train=train)
        y = ConvBlock(self.features, 1, norm="batch", ndim=3, dtype=self.dtype,
                      name="pw_linear")(y, train=train)
        return x + y if use_res else y


class MobileV1Residual(nn.Module):
    """Depthwise-separable residual (reference: msnet/submodule.py:45-91)."""

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]

        def dws(v, f, s, second_relu, name):
            v = ConvBlock(v.shape[-1], 3, strides=s, dilation=self.dilation,
                          groups=v.shape[-1], norm="batch", act=relu6,
                          dtype=self.dtype, name=f"{name}_dw")(v, train=train)
            v = ConvBlock(f, 1, norm="batch", act=relu6 if second_relu else None,
                          dtype=self.dtype, name=f"{name}_pw")(v, train=train)
            return v

        y = dws(x, self.features, self.strides, True, "conv1")
        y = dws(y, self.features, 1, False, "conv2")
        if self.strides != 1 or inp != self.features:
            x = ConvBlock(self.features, 1, strides=self.strides, norm="batch",
                          dtype=self.dtype, name="downsample")(x, train=train)
        return y + x


class MobileV2Residual(nn.Module):
    """Inverted residual: pw-expand → dw 3×3 → pw-linear, all BN
    (reference: lightstereo/aggregation.py:67-105)."""

    features: int
    strides: int = 1
    expanse_ratio: int = 4
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        hidden = int(inp * self.expanse_ratio)
        use_res = self.strides == 1 and inp == self.features

        y = ConvBlock(hidden, 1, norm="batch", act=relu6, dtype=self.dtype,
                      name="pw")(x, train=train)
        y = ConvBlock(hidden, 3, strides=self.strides, dilation=self.dilation,
                      groups=hidden, norm="batch", act=relu6, dtype=self.dtype,
                      name="dw")(y, train=train)
        y = ConvBlock(self.features, 1, norm="batch", dtype=self.dtype,
                      name="pw_linear")(y, train=train)
        return x + y if use_res else y
