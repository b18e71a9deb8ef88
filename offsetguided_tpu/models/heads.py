"""Prediction heads: per-stack 1x1 convs over backbone features.

Parity with reference models/heads.py:10-142. Outputs are cast to fp32 (the
decode/loss path needs full precision); channel layout is NHWC with the same
channel semantics as the reference (offsets interleaved [x0,y0,x1,y1,...]).
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
from flax import linen as nn

from ..config.defaults import HeadsConfig
from .layers import conv_init


class PoseHeads(nn.Module):
    """Heatmap + offset head group applied to every backbone stack.

    Returns a dict of per-stack lists:
      hmp (J), bg (1), jomp (2), omp (2L), spread (L), scmp (J)
    with absent heads mapped to None entries, mirroring the reference's empty
    lists (models/heads.py:54-70, 116-142).
    """
    cfg: HeadsConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _conv(self, features, name):
        if not self.cfg.tower:
            return nn.Conv(features, (1, 1), use_bias=True,
                           kernel_init=conv_init, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=name)

        class Tower(nn.Module):
            """3x3 conv + ReLU + 1x1 (reference models/heads_3x3.py variant)."""
            feats: int
            mid: int
            dtype: jnp.dtype
            param_dtype: jnp.dtype

            @nn.compact
            def __call__(self, x):
                x = nn.Conv(self.mid, (3, 3), padding='SAME', use_bias=True,
                            kernel_init=conv_init, dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)
                x = nn.relu(x)
                return nn.Conv(self.feats, (1, 1), use_bias=True,
                               kernel_init=conv_init, dtype=self.dtype,
                               param_dtype=self.param_dtype)(x)

        return Tower(features, self.cfg.tower_dim, self.dtype,
                     self.param_dtype, name=name)

    @nn.compact
    def __call__(self, stack_features: List[jnp.ndarray]) -> Dict[str, list]:
        cfg = self.cfg
        out = {'hmp': [], 'bg': [], 'jomp': [], 'omp': [], 'spread': [],
               'scmp': []}
        for i, x in enumerate(stack_features):
            x = x.astype(self.dtype)
            f32 = lambda v: v.astype(jnp.float32)
            out['hmp'].append(f32(self._conv(cfg.n_keypoints, f'hmp_{i}')(x)))
            out['bg'].append(
                f32(self._conv(1, f'bg_{i}')(x)) if cfg.include_background
                else None)
            out['jomp'].append(
                f32(self._conv(2, f'jomp_{i}')(x)) if cfg.include_jitter_offset
                else None)
            out['omp'].append(f32(self._conv(2 * cfg.n_limbs, f'omp_{i}')(x)))
            out['spread'].append(
                f32(self._conv(cfg.n_limbs, f'spread_{i}')(x))
                if cfg.include_spread else None)
            out['scmp'].append(
                f32(self._conv(cfg.n_keypoints, f'scmp_{i}')(x))
                if cfg.include_scale else None)
        return out
