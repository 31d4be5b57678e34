"""Disparity Proposal Network (reference stereo/modeling/models/nmrf/DPN.py:11-134).

Extracts per-pixel disparity modes from the groupwise cost volume
(1D high-pass conv stack along D → softmax → top-k local maxima) and
refines them with cross-shaped-window label-seed propagation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import head_dtype
from .nmp import MLPHead, Propagation

Dtype = Any


class DPN(nn.Module):
    cost_group: int = 4
    num_proposals: int = 4
    context_dim: int = 64
    num_prop_layers: int = 5
    prop_embed_dim: int = 128
    mlp_ratio: float = 4.0
    split_size: int = 1
    prop_n_heads: int = 4
    eps: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cost_volume, fmap1, *, train: bool = False):
        """cost_volume [B,H,W,G,D]; fmap1 [B,H,W,C] (1/8 features).

        Returns (prob [B,H,W,D], label_seeds [B,H,W,N] int,
        labels [B,H,W,N] float refined proposals).
        """
        b, h, w, g, nd = cost_volume.shape

        # 1D convs sliding along D — high-pass to sharpen modes
        # (reference DPN.py:32-38). [B,H,W,G,D] -> [B·H·W, D, G] conv1d.
        x = cost_volume.reshape(b * h * w, g, nd).transpose(0, 2, 1)
        for i, feats in enumerate((8, 16, 1)):
            x = nn.Conv(feats, (5,), padding=[(2, 2)], dtype=self.dtype,
                        name=f"mlp_{i}")(x)
            if i < 2:
                x = nn.relu(x)
        cost = x[..., 0]                                   # [BHW, D]
        prob = nn.softmax(cost.astype(head_dtype(self.dtype)),
                          axis=-1).astype(self.dtype)

        # top-k local maxima as label seeds (reference DPN.py:119-125):
        # non-local-max entries are floored to eps before top-k
        pooled = jax.lax.reduce_window(
            prob, -jnp.inf, jax.lax.max, (1, 3), (1, 1), "SAME")
        non_local_max = (prob != pooled) & (prob > self.eps)
        prob_ = jnp.where(non_local_max, self.eps, jax.lax.stop_gradient(prob))
        _, label_seeds = jax.lax.top_k(prob_, self.num_proposals)

        # visual context for the propagation affinities (DPN.py:45-49)
        ctx = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype, name="proj_0")(fmap1)
        ctx = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                           use_bias=False, use_scale=False, dtype=self.dtype,
                           name="proj_in")(ctx)
        ctx = nn.relu(ctx)
        ctx = nn.Conv(self.context_dim, (1, 1), use_bias=False,
                      dtype=self.dtype, name="proj_1")(ctx)

        seeds = label_seeds.reshape(b, h, w, self.num_proposals)
        memory = Propagation(
            embed_dim=self.prop_embed_dim, cost_group=self.cost_group,
            num_layers=self.num_prop_layers, num_heads=self.prop_n_heads,
            split_size=self.split_size, mlp_ratio=self.mlp_ratio,
            dtype=self.dtype, name="propagation")(
            cost_volume, seeds, ctx, train=train)
        out = MLPHead(self.prop_embed_dim, 1, dtype=self.dtype,
                      name="prop_head")(memory)[..., 0]
        labels = nn.relu(out + seeds.astype(out.dtype))
        prob = prob.reshape(b, h, w, nd)
        return prob, seeds, labels
