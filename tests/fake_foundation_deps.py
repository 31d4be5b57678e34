"""Fake modules so the reference FoundationStereo/MonSter oracle files
import in this offline image.

The reference foundation models import flash_attn (CUDA-only; its f32 path
falls back to SDPA — submodule.py:203-225, so the import just has to
succeed), plus trimesh / open3d / transformations via the wildcard
`from Utils import *` (point-cloud visualisation helpers the forward pass
never touches). None of the faked symbols participate in the numerics the
parity tests compare.
"""

import sys
import types


def _empty(name):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__all__ = []
        sys.modules[name] = m
    return sys.modules[name]


def install():
    # flash_attn: the reference's attn_qkv (submodule.py:203-225) routes f32
    # through SDPA and everything else (incl. the f64 oracle) through
    # flash_attn_func. Same math either way — provide the exact dense
    # attention in pure torch so any dtype works.
    if "flash_attn" not in sys.modules:
        import torch

        fa = types.ModuleType("flash_attn")

        def flash_attn_func(q, k, v, window_size=(-1, -1),
                            softmax_scale=None, causal=False, **kw):
            # q,k,v: (B, L, H, D)
            assert tuple(window_size) == (-1, -1) and not causal, \
                "fake flash_attn supports full attention only"
            scale = softmax_scale or q.shape[-1] ** -0.5
            attn = torch.einsum("blhd,bmhd->bhlm", q * scale, k)
            p = attn.softmax(-1)
            return torch.einsum("bhlm,bmhd->blhd", p, v)

        def flash_attn_qkvpacked_func(qkv, **kw):
            q, k, v = qkv.unbind(2)  # (B, L, 3, H, D)
            return flash_attn_func(q, k, v, **kw)

        fa.flash_attn_func = flash_attn_func
        fa.flash_attn_qkvpacked_func = flash_attn_qkvpacked_func
        sys.modules["flash_attn"] = fa

    for name in ("trimesh", "open3d", "transformations"):
        _empty(name)
