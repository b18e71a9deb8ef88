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

    def _head_spec(self):
        cfg = self.cfg
        return [('hmp', cfg.n_keypoints, True),
                ('bg', 1, cfg.include_background),
                ('jomp', 2, cfg.include_jitter_offset),
                ('omp', 2 * cfg.n_limbs, True),
                ('spread', cfg.n_limbs, cfg.include_spread),
                ('scmp', cfg.n_keypoints, cfg.include_scale)]

    @nn.compact
    def __call__(self, stack_features: List[jnp.ndarray]) -> Dict[str, list]:
        cfg = self.cfg
        out = {'hmp': [], 'bg': [], 'jomp': [], 'omp': [], 'spread': [],
               'scmp': []}
        spec = self._head_spec()
        for i, x in enumerate(stack_features):
            x = x.astype(self.dtype)
            f32 = lambda v: v.astype(jnp.float32)
            if not cfg.tower:
                # fused head pass: all per-head 1x1 convs share the same
                # (N, H, W, C) input, so running them separately reads it
                # once per head (~0.5 ms/batch-8 of pure HBM traffic at
                # 640^2). Concatenating the kernels on the output-channel
                # axis computes every head in ONE matmul; the parameter tree
                # (hmp_i/kernel ...) is unchanged, so checkpoints and the
                # torch converter are unaffected.
                ks, bs = [], []
                for key, feats, active in spec:
                    if not active:
                        continue
                    k, b = _HeadParams(feats, x.shape[-1],
                                       param_dtype=self.param_dtype,
                                       name=f'{key}_{i}')()
                    ks.append(k.reshape(x.shape[-1], feats))
                    bs.append(b)
                W = jnp.concatenate(ks, axis=-1).astype(self.dtype)
                B = jnp.concatenate(bs).astype(self.dtype)
                y = f32(jnp.dot(x, W) + B)
                o = 0
                for key, feats, active in spec:
                    if active:
                        out[key].append(y[..., o:o + feats])
                        o += feats
                    else:
                        out[key].append(None)
                continue
            for key, feats, active in spec:
                out[key].append(
                    f32(self._conv(feats, f'{key}_{i}')(x)) if active
                    else None)
        return out


class _HeadParams(nn.Module):
    """nn.Conv-compatible 1x1 head parameters (kernel (1,1,in,f) + bias) so
    the fused head pass keeps the exact historical parameter tree."""
    features: int
    in_features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param('kernel', conv_init,
                       (1, 1, self.in_features, self.features),
                       self.param_dtype)
        b = self.param('bias', nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        return k, b
