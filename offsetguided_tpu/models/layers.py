"""Shared flax.linen building blocks for the hourglass backbones.

NHWC layout throughout (TPU-native). Convolutions run in the configured
compute dtype (bf16 by default); BatchNorm statistics and parameters stay in
fp32 -- the TPU equivalent of apex AMP O1 used by the reference
(train_dist.py:226-229). Under `jax.jit` over a data-sharded mesh, BatchNorm's
batch statistics are computed over the *global* batch, which reproduces apex
SyncBN (train_dist.py:185-191) without a dedicated wrapper.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# normal(0, 0.001) conv init matches the reference initialize_weights
# (models/networks.py:147-173)
conv_init = nn.initializers.normal(stddev=0.001)


class ConvBN(nn.Module):
    """k x k conv + BN + ReLU (reference models/hourglass_104.py:16-30)."""
    features: int
    kernel: int = 3
    stride: int = 1
    with_bn: bool = True
    relu: bool = True
    leaky: float = 0.0       # slope for LeakyReLU (4-stage blocks use 0.01)
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding='SAME', use_bias=not self.with_bn,
                    kernel_init=conv_init,
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if self.with_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             dtype=jnp.float32,
                             param_dtype=self.param_dtype)(x)
            x = x.astype(self.dtype)
        if self.relu:
            x = nn.leaky_relu(x, self.leaky) if self.leaky else nn.relu(x)
        return x


class BasicResidual(nn.Module):
    """Two 3x3 convs + projection skip (reference models/hourglass_104.py:50-79)."""
    features: int
    stride: int = 1
    leaky: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = (lambda v: nn.leaky_relu(v, self.leaky)) if self.leaky else nn.relu
        kw = dict(padding='SAME', use_bias=False, kernel_init=conv_init,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda v: nn.BatchNorm(use_running_average=not train,
                                    momentum=self.bn_momentum,
                                    dtype=jnp.float32,
                                    param_dtype=self.param_dtype)(v)

        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2, **kw)(x)
        y = act(bn(y).astype(self.dtype))
        y = nn.Conv(self.features, (3, 3), **kw)(y)
        y = bn(y).astype(self.dtype)

        if self.stride != 1 or x.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                           **kw)(x)
            skip = bn(skip).astype(self.dtype)
        else:
            skip = x
        return act(y + skip)


class BottleneckResidual(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with LeakyReLU (reference models/layers.py:11-49),
    used by the 4-stage IMHN backbone."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        kw = dict(use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        bn = lambda v: nn.BatchNorm(use_running_average=not train,
                                    momentum=self.bn_momentum,
                                    dtype=jnp.float32,
                                    param_dtype=self.param_dtype)(v)
        act = lambda v: nn.leaky_relu(v, 0.01)

        y = nn.Conv(half, (1, 1), **kw)(x)
        y = act(bn(y).astype(self.dtype))
        y = nn.Conv(half, (3, 3), padding='SAME', **kw)(y)
        y = act(bn(y).astype(self.dtype))
        y = nn.Conv(self.features, (1, 1), **kw)(y)
        y = bn(y).astype(self.dtype)

        if x.shape[-1] != self.features:
            skip = bn(nn.Conv(self.features, (1, 1), **kw)(x)).astype(self.dtype)
        else:
            skip = x
        return act(y + skip)


class SELayer(nn.Module):
    """Squeeze-and-excitation channel attention (reference models/layers.py SELayer)."""
    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        s = nn.Dense(c // self.reduction, dtype=self.dtype,
                     param_dtype=self.param_dtype)(s.astype(self.dtype))
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


def upsample_nearest2x(x):
    """nn.Upsample(scale_factor=2) equivalent: repeat each pixel 2x2."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def max_pool2x(x):
    """2x2 stride-2 max pooling."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))
