"""4-stage IMHN-style hourglass backbone (SimplePose) in flax.linen, NHWC.

Capability parity with the reference's alternative backbone
(models/hourglass_4stage.py, models/layers.py). Note the reference *declares*
this network but its factory refuses to build it (models/networks.py:217-225);
here it is a first-class, buildable backbone.

Structure: dilated-conv stem at stride 4 (Backbone, models/layers.py:189-228),
`n_stacks` fourth-order hourglass blocks whose channel count grows by
`increase` per scale, SE-attention feature blocks, and inter-stack residual
feedback at the top scale. Each stack contributes one stride-4 feature map of
`feat_dim` channels to the shared heads (the reference's 5-scale deep
supervision is collapsed to the top scale, which is the only scale its decode
path consumes).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config.defaults import ModelConfig
from .layers import (BottleneckResidual, ConvBN, SELayer, max_pool2x,
                     upsample_nearest2x)


class DilatedStem(nn.Module):
    """Stride-4 stem with stacked dilated convs (reference models/layers.py:189-228)."""
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_momentum=self.bn_momentum)
        x = ConvBN(64, kernel=7, stride=2, leaky=0.01, **kw)(x, train)
        x = BottleneckResidual(128, **kw)(x, train)
        x = max_pool2x(x)
        x = BottleneckResidual(128, **kw)(x, train)
        y = x
        for dil in (3, 3, 4, 4, 5, 5):
            y = ConvBN(128, kernel=3, dilation=dil, leaky=0.01, **kw)(y, train)
        return jnp.concatenate([x, y], axis=-1)  # 256 channels


class HourglassBlock(nn.Module):
    """Fourth-order hourglass with +increase channels per scale
    (reference models/layers.py Hourglass)."""
    depth: int
    feat: int
    increase: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_momentum=self.bn_momentum)
        up1 = BottleneckResidual(self.feat, **kw)(x, train)
        low = max_pool2x(x)
        low = BottleneckResidual(self.feat + self.increase, **kw)(low, train)
        if self.depth > 1:
            low = HourglassBlock(self.depth - 1, self.feat + self.increase,
                                 self.increase, **kw)(low, train)
        else:
            low = BottleneckResidual(self.feat + self.increase, **kw)(low, train)
        low = BottleneckResidual(self.feat, **kw)(low, train)
        return up1 + upsample_nearest2x(low)


class Hourglass4Stage(nn.Module):
    """4-stack IMHN backbone; returns a list of per-stack stride-4 features."""
    cfg: ModelConfig = ModelConfig(basenet='hourglass4stage', n_stacks=4)
    increase: int = 128
    feat_dim: int = 256

    @nn.compact
    def __call__(self, image, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        kw = dict(dtype=dtype, param_dtype=pdtype, bn_momentum=cfg.bn_momentum)

        x = DilatedStem(**kw)(image.astype(dtype), train)
        # remat: see hourglass104.py — per-stack recompute, stable param names
        hg_cls = (nn.remat(HourglassBlock, static_argnums=(2,)) if cfg.remat
                  else HourglassBlock)
        outs = []
        for i in range(cfg.n_stacks):
            hg = hg_cls(4, self.feat_dim, self.increase,
                        name=f'HourglassBlock_{i}', **kw)(x, train)
            feat = ConvBN(self.feat_dim, kernel=3, leaky=0.01, **kw)(hg, train)
            feat = ConvBN(self.feat_dim, kernel=3, leaky=0.01, **kw)(feat, train)
            feat = SELayer(dtype=dtype, param_dtype=pdtype)(feat)
            outs.append(feat)
            if i < cfg.n_stacks - 1:
                x = x + ConvBN(x.shape[-1], kernel=1, relu=False, **kw)(
                    feat, train)
        return outs
