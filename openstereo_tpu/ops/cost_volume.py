"""Cost-volume builders — the kernel-critical core of stereo matching.

TPU-native redesign of the reference builders
(reference: stereo/modeling/cost_volume/cost_volume.py:32-117). Differences:

- **NHWC layouts.** 2D volumes come out as ``[B, H, W, D]`` (disparity in the
  128-lane dimension — it feeds 2D aggregators that treat D as channels), and
  4D volumes as ``[B, D, H, W, C]`` (channels last for NDHWC 3D convolutions).
- **Static unrolled shifts.** The reference mutates a zero-initialised tensor
  in a Python loop over disparities; in XLA we emit `max_disp` static slices
  and stack — the compiler fuses the whole construction into one pass, and
  there is no in-place aliasing to defeat it.
- The hot builders also have Pallas MXU kernels (`ops/pallas/`) that compute
  the band of L·Rᵀ directly with matmuls; these jnp versions are the
  reference implementations they are tested against.

All shifts follow the stereo convention: for disparity ``d``, the left pixel
``(h, w)`` matches the right pixel ``(h, w - d)``; out-of-frame entries are 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shifted_pairs(left: jnp.ndarray, right: jnp.ndarray, d: int):
    """Overlapping [B,H,W-d,C] views of left/right for disparity d."""
    if d == 0:
        return left, right
    return left[:, :, d:, :], right[:, :, :-d, :]


def _pad_front_w(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Zero-pad a [B,H,W-d,...] slice back to W at the front of the W axis."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[2] = (d, 0)
    return jnp.pad(x, pad)


def correlation_volume(left: jnp.ndarray, right: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Mean-product correlation volume (reference: cost_volume.py:32-41).

    left/right: [B, H, W, C] → [B, H, W, D] with D = max_disp.
    """
    b, h, w, _ = left.shape
    planes = []
    for d in range(max_disp):
        if d >= w:
            # shift beyond the frame: no overlap → zero plane (the reference's
            # build_corr falls back to the full product here, cost_volume.py:100;
            # that only triggers on degenerate inputs and zeros are the
            # geometrically correct value)
            planes.append(jnp.zeros((b, h, w), left.dtype))
            continue
        l, r = _shifted_pairs(left, right, d)
        planes.append(_pad_front_w(jnp.mean(l * r, axis=-1), d))
    return jnp.stack(planes, axis=-1)


def groupwise_correlation(fea1: jnp.ndarray, fea2: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """[B,H,W,C] × [B,H,W,C] → [B,H,W,G]: per-group mean product
    (reference: cost_volume.py:59-66)."""
    b, h, w, c = fea1.shape
    assert c % num_groups == 0, (c, num_groups)
    prod = (fea1 * fea2).reshape(b, h, w, num_groups, c // num_groups)
    return jnp.mean(prod, axis=-1)


def build_gwc_volume(left: jnp.ndarray, right: jnp.ndarray, max_disp: int,
                     num_groups: int) -> jnp.ndarray:
    """Group-wise correlation volume (reference: cost_volume.py:69-78).

    [B,H,W,C] → [B, D, H, W, G] (NDHWC for 3D aggregation).
    """
    b, h, w, _ = left.shape
    planes = []
    for d in range(max_disp):
        if d >= w:
            # shift beyond the frame: no overlap → zero plane (matches the
            # reference's zero-initialised buffer, e.g. nmrf/submodule.py:15)
            planes.append(jnp.zeros((b, h, w, num_groups), left.dtype))
            continue
        l, r = _shifted_pairs(left, right, d)
        planes.append(_pad_front_w(groupwise_correlation(l, r, num_groups), d))
    return jnp.stack(planes, axis=1)


def build_concat_volume(left: jnp.ndarray, right: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Concatenation volume (reference: cost_volume.py:81-92).

    [B,H,W,C] → [B, D, H, W, 2C]: left features and d-shifted right features.
    Both halves are zeroed where the right view falls out of frame, matching
    the reference's zero-initialised buffer semantics.
    """
    planes = []
    for d in range(max_disp):
        l, r = _shifted_pairs(left, right, d)
        planes.append(_pad_front_w(jnp.concatenate([l, r], axis=-1), d))
    return jnp.stack(planes, axis=1)


def build_corr_volume(left: jnp.ndarray, right: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Alias of :func:`correlation_volume` kept for config-name parity
    (reference: cost_volume.py:95-105)."""
    return correlation_volume(left, right, max_disp)


def build_diff_volume(reference: jnp.ndarray, target: jnp.ndarray, max_disp: int,
                      side: str = "left") -> jnp.ndarray:
    """Difference volume (reference: cost_volume.py:44-56).

    [B,H,W,C] → [B, D, H, W, C] of (reference - shifted target).
    """
    planes = []
    for d in range(max_disp):
        if side == "left":
            l, r = _shifted_pairs(reference, target, d)
            planes.append(_pad_front_w(l - r, d))
        elif side == "right":
            if d == 0:
                diff = target - reference
            else:
                diff = target[:, :, d:, :] - reference[:, :, :-d, :]
                pad = [(0, 0)] * diff.ndim
                pad[2] = (0, d)
                diff = jnp.pad(diff, pad)
            planes.append(diff)
        else:
            raise ValueError(side)
    return jnp.stack(planes, axis=1)


def build_sub_volume(left: jnp.ndarray, right: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """L1-distance volume (reference: cost_volume.py:108-117).

    [B,H,W,C] → [B,H,W,D]. Where the right view is out of frame the cost is
    the L1 norm of the left features alone (reference behaviour).
    """
    planes = []
    l1_left = jnp.sum(jnp.abs(left), axis=-1)  # [B,H,W]
    for d in range(max_disp):
        l, r = _shifted_pairs(left, right, d)
        valid = jnp.sum(jnp.abs(l - r), axis=-1)  # [B,H,W-d]
        if d == 0:
            planes.append(valid)
        else:
            plane = jnp.concatenate([l1_left[:, :, :d], valid], axis=2)
            planes.append(plane)
    return jnp.stack(planes, axis=-1)
