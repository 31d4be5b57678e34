"""Fake modules so the NMRF torch oracle loads in this offline image.

The reference NMRF (stereo/modeling/models/nmrf/) imports
- `MultiScaleDeformableAttention` — its compiled CUDA extension. Replaced
  with the reference's own documented python semantics
  (ms_deform_attn_core_pytorch, ops/functions/ms_deform_attn_func.py:49-71:
  per-level grid_sample + weighted sum) and a python port of the
  superpixel-downsample kernel (ops/src/cuda/downsample_cuda.cu:85-150);
- `timm.models.layers` / `timm.layers` — trunc_normal_, DropPath, Mlp,
  to_2tuple (standard, torch-implementable in a few lines);
- its local `config.configurable` decorator — in the OpenStereo
  integration the MODEL config is an EasyDict, never a yacs CfgNode, so
  `_called_with_cfg` is always False (config/config.py:334-348) and the
  decorator is a pass-through; replaced with exactly that (avoids the
  yacs/omegaconf dependency).

Install with :func:`install` BEFORE ref_oracle.load_ref_module.
"""

import itertools
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# MultiScaleDeformableAttention
# ---------------------------------------------------------------------------

def _msda_core(value, value_spatial_shapes, sampling_locations,
               attention_weights):
    """Reference python fallback semantics (ms_deform_attn_func.py:49-71)."""
    n, s, m, d = value.shape
    _, lq, m, l, p, _ = sampling_locations.shape
    value_list = value.split([int(h) * int(w)
                              for h, w in value_spatial_shapes], dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (h, w) in enumerate(value_spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2)
        v = v.reshape(n * m, d, int(h), int(w))
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros",
                                     align_corners=False))
    w_ = attention_weights.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w_).sum(-1)
    return out.view(n, m * d, lq).transpose(1, 2).contiguous()


def _downsample_forward(inp, label, nms_thresh):
    """Python port of downsample_cuda.cu:85-150 (per 64-pixel block: group
    valid pixels by superpixel label, NMS-merge group medians by size,
    output up to 4 mode medians). Ties broken by first occurrence."""
    out = torch.zeros(inp.shape[0], 4, dtype=inp.dtype)
    for r in range(inp.shape[0]):
        vals = inp[r].numpy()
        labs = label[r].numpy()
        ok = vals > 0
        vv, ll = vals[ok], labs[ok]
        groups = {}
        for g in dict.fromkeys(ll.tolist()):  # preserves sorted-label order
            import numpy as np
            groups[g] = np.sort(vv[ll == g])
        order = sorted(groups, key=lambda g: (-len(groups[g]),
                                              list(groups).index(g)))
        taken, mi = set(), 0
        for g in order:
            if mi >= 4:
                break
            if g in taken:
                continue
            pool = list(groups[g])
            gm = groups[g][len(groups[g]) // 2]
            taken.add(g)
            for g2 in order:
                if g2 in taken:
                    continue
                m2 = groups[g2][len(groups[g2]) // 2]
                if abs(m2 - gm) < nms_thresh:
                    taken.add(g2)
                    pool.extend(groups[g2])
            import numpy as np
            pool = np.sort(np.asarray(pool))
            out[r, mi] = float(pool[len(pool) // 2])
            mi += 1
    return out


def _install_msda():
    if "MultiScaleDeformableAttention" in sys.modules:
        return
    mod = types.ModuleType("MultiScaleDeformableAttention")

    def ms_deform_attn_forward(value, shapes, level_start_index,
                               sampling_locations, attention_weights,
                               im2col_step):
        return _msda_core(value, shapes, sampling_locations,
                          attention_weights)

    def ms_deform_attn_backward(*a, **k):  # oracle is forward-only
        raise NotImplementedError

    mod.ms_deform_attn_forward = ms_deform_attn_forward
    mod.ms_deform_attn_backward = ms_deform_attn_backward
    mod.downsample_forward = _downsample_forward
    sys.modules["MultiScaleDeformableAttention"] = mod


# ---------------------------------------------------------------------------
# timm.models.layers / timm.layers
# ---------------------------------------------------------------------------

class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        if self.scale_by_keep:
            mask.div_(keep)
        return x * mask


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0, **kw):
        super().__init__()
        hidden_features = hidden_features or in_features
        out_features = out_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


def to_2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _install_timm_layers():
    import fake_timm
    timm = fake_timm.install()
    for name in ("timm.models", "timm.models.layers", "timm.layers"):
        if name in sys.modules:
            continue
        sub = types.ModuleType(name)
        sys.modules[name] = sub
    for modname in ("timm.models.layers", "timm.layers"):
        mod = sys.modules[modname]
        mod.trunc_normal_ = nn.init.trunc_normal_
        mod.DropPath = DropPath
        mod.Mlp = Mlp
        mod.to_2tuple = to_2tuple
    if not hasattr(sys.modules["timm.models"], "layers"):
        sys.modules["timm.models"].layers = sys.modules["timm.models.layers"]
    timm.models = sys.modules["timm.models"]
    timm.layers = sys.modules["timm.layers"]


# ---------------------------------------------------------------------------
# nmrf.config (pass-through configurable; avoids yacs/omegaconf)
# ---------------------------------------------------------------------------

def _install_nmrf_config():
    name = "stereo.modeling.models.nmrf.config"
    if name in sys.modules:
        return
    mod = types.ModuleType(name)

    def configurable(init_func=None, *, from_config=None):
        if init_func is not None:
            return init_func
        return lambda f: f

    mod.configurable = configurable
    sys.modules[name] = mod


def install():
    _install_msda()
    _install_timm_layers()
    _install_nmrf_config()
