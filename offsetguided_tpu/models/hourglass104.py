"""Hourglass-104 backbone (CornerNet/CenterNet exkp) in flax.linen, NHWC.

Structural parity with the reference (models/hourglass_104.py:132-321):
- stem: 7x7 s2 conv-BN-ReLU (128) + stride-2 residual (256) -> stride 4
- `n_stacks` recursive 5th-order hourglass modules over channel schedule
  dims=[256,256,384,384,384,512], modules=[2,2,2,2,2,4]
- downsampling via the first stride-2 residual of each `hg` branch (the
  reference's make_pool_layer is a no-op, hourglass_104.py:109-110),
  upsampling via nearest-neighbor 2x
- inter-stack fusion inter = relu(1x1BN(inter) + 1x1BN(cnv)) -> residual
- returns the per-stack 256-channel stride-4 feature maps (heads live in
  heads.py, as the reference strips them, hourglass_104.py:252-267).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config.defaults import ModelConfig
from .layers import BasicResidual, ConvBN, conv_init, upsample_nearest2x


class KPModule(nn.Module):
    """Recursive hourglass block (reference models/hourglass_104.py:132-190)."""
    n: int
    dims: Tuple[int, ...]
    modules: Tuple[int, ...]
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9

    def _res(self, features, stride=1):
        return BasicResidual(features, stride=stride, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             bn_momentum=self.bn_momentum)

    @nn.compact
    def __call__(self, x, train: bool = False):
        curr_dim, next_dim = self.dims[0], self.dims[1]
        curr_mod, next_mod = self.modules[0], self.modules[1]

        up1 = x
        for _ in range(curr_mod):
            up1 = self._res(curr_dim)(up1, train)

        low1 = self._res(next_dim, stride=2)(x, train)
        for _ in range(curr_mod - 1):
            low1 = self._res(next_dim)(low1, train)

        if self.n > 1:
            low2 = KPModule(self.n - 1, self.dims[1:], self.modules[1:],
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            bn_momentum=self.bn_momentum)(low1, train)
        else:
            low2 = low1
            for _ in range(next_mod):
                low2 = self._res(next_dim)(low2, train)

        low3 = low2
        for _ in range(curr_mod - 1):
            low3 = self._res(next_dim)(low3, train)
        low3 = self._res(curr_dim)(low3, train)

        return up1 + upsample_nearest2x(low3)


class Hourglass104(nn.Module):
    """Stacked hourglass backbone; returns list of per-stack (N,H/4,W/4,256)."""
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, image, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        kw = dict(dtype=dtype, param_dtype=pdtype, bn_momentum=cfg.bn_momentum)

        x = image.astype(dtype)
        x = ConvBN(128, kernel=7, stride=2, s2d=cfg.stem_s2d, **kw)(x, train)
        inter = BasicResidual(256, stride=2, **kw)(x, train)

        # remat: recompute each stack's activations in the backward instead
        # of storing them; explicit names keep the param tree identical
        kp_cls = (nn.remat(KPModule, static_argnums=(2,)) if cfg.remat
                  else KPModule)
        outs = []
        for ind in range(cfg.n_stacks):
            kp = kp_cls(cfg.hg_order, tuple(cfg.dims), tuple(cfg.modules),
                        name=f'KPModule_{ind}', **kw)(inter, train)
            cnv = ConvBN(cfg.cnv_dim, kernel=3, **kw)(kp, train)
            outs.append(cnv)

            if ind < cfg.n_stacks - 1:
                a = ConvBN(256, kernel=1, relu=False, **kw)(inter, train)
                b = ConvBN(256, kernel=1, relu=False, **kw)(cnv, train)
                inter = nn.relu(a + b)
                inter = BasicResidual(256, **kw)(inter, train)
        return outs
