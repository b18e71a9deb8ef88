"""Shared flax.linen building blocks for the hourglass backbones.

NHWC layout throughout (TPU-native). Convolutions run in the configured
compute dtype (bf16 by default); BatchNorm statistics and parameters stay in
fp32 -- the TPU equivalent of apex AMP O1 used by the reference
(train_dist.py:226-229). Under `jax.jit` over a data-sharded mesh, BatchNorm's
batch statistics are computed over the *global* batch, which reproduces apex
SyncBN (train_dist.py:185-191) without a dedicated wrapper.

Two inference-path optimizations (both produce parameter trees identical to
the flax nn.Conv/nn.BatchNorm naming, so checkpoints and the torch converter
are unaffected):

- **Folded BatchNorm**: at eval time the per-channel BN affine is folded into
  the conv kernel/bias (w' = w * gamma/sqrt(var+eps), b' = beta - mean * that)
  so the conv epilogue is a single bf16 bias-add instead of an fp32
  subtract/multiply/add chain over the full activation -- the fp32 chain was
  measured costing ~15% of every conv fusion on v5e. Numerically this is
  *closer* to fp32 reference behavior: the bias rides the conv's fp32
  accumulator instead of being applied to the already-rounded bf16 output.
- **Space-to-depth stem**: a stride-2 conv on a 3-channel image starves the
  MXU (measured 8% MFU on the 7x7 stem). With `s2d=True` the conv is executed
  as an exactly-equivalent stride-1 conv on the 2x2 space-to-depth input
  (kernel re-indexed accordingly), raising the contraction depth 4x.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# normal(0, 0.001) conv init matches the reference initialize_weights
# (models/networks.py:147-173)
conv_init = nn.initializers.normal(stddev=0.001)

# s2d stem formulation: 'full' = 2x2 space-to-depth (H-parity interleave
# copy + stride-1 conv), 'wfold' = fold only W pairs (free reshape) and keep
# the H stride in the conv. Both are bit-equivalent to the strided conv;
# 'wfold' avoids materializing any transpose of the full-res image.
_S2D_MODE = 'wfold'


class Conv(nn.Module):
    """2-D convolution, parameter-compatible with flax nn.Conv
    (params `kernel` (kh, kw, in, out) and optional `bias` (out,)).

    Default padding is 'TORCH': symmetric dilation*(k-1)//2 per side, the
    torch Conv2d convention the reference uses everywhere
    (models/hourglass_104.py:16-22 `pad = (k - 1) // 2`). For stride-1 odd
    kernels this equals SAME; for stride-2 it differs (SAME pads
    asymmetrically on even inputs, shifting every downsample by one input
    pixel), and matching the reference geometry is required for converted
    reference checkpoints to reproduce their outputs.

    `fold_scale`/`fold_shift` apply a per-output-channel affine *inside* the
    conv (folded BatchNorm); `s2d=True` executes an odd-kernel stride-2 conv
    in the space-to-depth domain (bit-equivalent result, MXU-friendly
    contraction depth).
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'TORCH'
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = conv_init
    s2d: bool = False

    @nn.compact
    def __call__(self, x, fold_scale=None, fold_shift=None):
        kh, kw = self.kernel_size
        in_f = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init,
                            (kh, kw, in_f, self.features), self.param_dtype)
        bias = (self.param('bias', nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)

        if fold_scale is not None:
            kernel = kernel * fold_scale          # fp32, per-output-channel
        shift = bias
        if fold_shift is not None:
            shift = fold_shift if shift is None else shift + fold_shift

        if self.padding == 'TORCH':
            padding = tuple((d * (k - 1) // 2,) * 2 for k, d in
                            zip(self.kernel_size, self.kernel_dilation))
        else:
            padding = self.padding

        x = x.astype(self.dtype)
        if (self.s2d and self.strides == (2, 2)
                and self.kernel_dilation == (1, 1)
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and kh == kw and kh % 2 == 1 and self.padding == 'TORCH'):
            y = (self._s2d_conv_wfold(x, kernel) if _S2D_MODE == 'wfold'
                 else self._s2d_conv(x, kernel))
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype),
                window_strides=self.strides, padding=padding,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if shift is not None:
            y = y + shift.astype(self.dtype)
        return y

    def _s2d_conv(self, x, kernel):
        """Odd k x k stride-2 torch-padded conv (even input) as a stride-1
        conv on the 2x2 space-to-depth input.

        With pad P = (k-1)//2, output pixel p reads input u = 2p + a - P for
        kernel tap a. Writing u = 2i + d (i: s2d pixel, d: parity channel)
        gives a = 2(i - p) + d + P; substituting the s2d tap j = (i - p) + lo
        with lo = (P+1)//2 yields a = 2j + d - (P % 2), so the s2d kernel is
        the original kernel zero-padded by P%2 at the front (and to even
        length at the back) and reshaped by tap parity -- a pure
        reshape/transpose. For k=7: 4x4 taps over 4c channels, pad (2, 1).
        """
        n, h, w, c = x.shape
        kh, kw = self.kernel_size
        P = (kh - 1) // 2
        front = P % 2
        k2 = (kh + front + 1) // 2                   # s2d tap count
        pad = jnp.pad(kernel, ((front, 2 * k2 - kh - front),
                               (front, 2 * k2 - kw - front),
                               (0, 0), (0, 0)))
        kk = pad.reshape(k2, 2, k2, 2, c, self.features)
        kk = kk.transpose(0, 2, 1, 3, 4, 5).reshape(k2, k2, 4 * c,
                                                    self.features)
        # W-pairs fold into channels as a FREE reshape (contiguous), so the
        # only data movement is the H-parity interleave -- measured ~2x
        # cheaper than the naive 6D space-to-depth transpose on 3-channel
        # images (the channel order (d1*2 + d2)*c + ci is unchanged)
        xs = x.reshape(n, h // 2, 2, w // 2, 2 * c)
        xs = xs.transpose(0, 1, 3, 2, 4).reshape(n, h // 2, w // 2, 4 * c)
        lo = (P + 1) // 2
        hi = k2 - 1 - lo
        return jax.lax.conv_general_dilated(
            xs, kk.astype(self.dtype), (1, 1),
            padding=((lo, hi), (lo, hi)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def _s2d_conv_wfold(self, x, kernel):
        """Same conv, but only the W-parity pairs fold into channels (a FREE
        reshape on contiguous NHWC data); H keeps its stride-2 inside the
        conv with the kernel's H taps zero-padded to even length. No
        transpose of the full-resolution image is materialized at all."""
        n, h, w, c = x.shape
        kh, kw = self.kernel_size
        P = (kh - 1) // 2
        front = P % 2
        k2 = (kh + front + 1) // 2                   # W-folded tap count
        lo = (P + 1) // 2
        hi = k2 - 1 - lo
        pad = jnp.pad(kernel, ((front, 2 * k2 - kh - front),
                               (front, 2 * k2 - kw - front),
                               (0, 0), (0, 0)))
        # (ah, jw, dw, c, f): H taps raw (2*k2 of them), W folded by parity
        kk = pad.reshape(2 * k2, k2, 2 * c, self.features)
        xs = x.reshape(n, h, w // 2, 2 * c)          # contiguous: free
        # output row p reads padded-tap ah at u = 2p + ah - (P + front); the
        # high pad must also satisfy the window-count formula with the
        # zero-padded kernel length 2*k2 (extra rows meet only zero taps)
        pad_hi = max(2 * k2 - 2 - P - front, 0)
        return jax.lax.conv_general_dilated(
            xs, kk.astype(self.dtype), (2, 1),
            padding=((P + front, pad_hi), (lo, hi)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class BatchNorm(nn.Module):
    """BatchNorm, parameter-compatible with flax nn.BatchNorm
    (params `scale`/`bias`, batch_stats `mean`/`var`, fast-variance train
    statistics, identical momentum semantics).

    Exposes `fold_factors()` so conv callers can fold the eval-time affine
    into their kernel instead of running an fp32 elementwise pass.
    """
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param('scale', nn.initializers.ones,
                                (self.features,), self.param_dtype)
        self.offset = self.param('bias', nn.initializers.zeros,
                                 (self.features,), self.param_dtype)
        self.ra_mean = self.variable(
            'batch_stats', 'mean',
            lambda: jnp.zeros((self.features,), jnp.float32))
        self.ra_var = self.variable(
            'batch_stats', 'var',
            lambda: jnp.ones((self.features,), jnp.float32))

    def __call__(self, x, train: bool = False):
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            var = mean2 - jnp.square(mean)       # flax fast-variance
            if not self.is_initializing():
                m = self.momentum
                self.ra_mean.value = m * self.ra_mean.value + (1 - m) * mean
                self.ra_var.value = m * self.ra_var.value + (1 - m) * var
        else:
            mean, var = self.ra_mean.value, self.ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * self.scale + self.offset

    def fold_factors(self):
        """(scale, shift) such that y = conv(x) * scale + shift == BN(conv(x))."""
        s = self.scale * jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        return s, self.offset - self.ra_mean.value * s


class ConvBN(nn.Module):
    """k x k conv + BN + ReLU (reference models/hourglass_104.py:16-30)."""
    features: int
    kernel: int = 3
    stride: int = 1
    with_bn: bool = True
    relu: bool = True
    leaky: float = 0.0       # slope for LeakyReLU (4-stage blocks use 0.01)
    dilation: int = 1
    s2d: bool = False        # space-to-depth execution (stride-2 stems)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=not self.with_bn, s2d=self.s2d,
                    dtype=self.dtype, param_dtype=self.param_dtype)
        if self.with_bn:
            bn = BatchNorm(self.features, momentum=self.bn_momentum,
                           param_dtype=self.param_dtype)
            if train:
                x = bn(conv(x), train=True).astype(self.dtype)
            else:
                x = conv(x, *bn.fold_factors())
        else:
            x = conv(x)
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
        kw = dict(use_bias=False, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        mk_bn = lambda: BatchNorm(self.features, momentum=self.bn_momentum,
                                  param_dtype=self.param_dtype)

        conv1 = Conv(self.features, (3, 3), strides=(self.stride,) * 2, **kw)
        bn1 = mk_bn()
        conv2 = Conv(self.features, (3, 3), **kw)
        bn2 = mk_bn()
        need_skip = self.stride != 1 or x.shape[-1] != self.features
        if need_skip:
            conv3 = Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                         **kw)
            bn3 = mk_bn()

        if train:
            y = act(bn1(conv1(x), train=True).astype(self.dtype))
            y = bn2(conv2(y), train=True).astype(self.dtype)
            skip = (bn3(conv3(x), train=True).astype(self.dtype)
                    if need_skip else x)
        else:
            y = act(conv1(x, *bn1.fold_factors()))
            y = conv2(y, *bn2.fold_factors())
            skip = conv3(x, *bn3.fold_factors()) if need_skip else x
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
        kw = dict(use_bias=False, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        mk_bn = lambda f: BatchNorm(f, momentum=self.bn_momentum,
                                    param_dtype=self.param_dtype)
        act = lambda v: nn.leaky_relu(v, 0.01)

        conv1, bn1 = Conv(half, (1, 1), **kw), mk_bn(half)
        conv2, bn2 = Conv(half, (3, 3), **kw), mk_bn(half)
        conv3, bn3 = Conv(self.features, (1, 1), **kw), mk_bn(self.features)
        need_skip = x.shape[-1] != self.features
        if need_skip:
            conv4, bn4 = Conv(self.features, (1, 1), **kw), mk_bn(self.features)

        if train:
            y = act(bn1(conv1(x), train=True).astype(self.dtype))
            y = act(bn2(conv2(y), train=True).astype(self.dtype))
            y = bn3(conv3(y), train=True).astype(self.dtype)
            skip = (bn4(conv4(x), train=True).astype(self.dtype)
                    if need_skip else x)
        else:
            y = act(conv1(x, *bn1.fold_factors()))
            y = act(conv2(y, *bn2.fold_factors()))
            y = conv3(y, *bn3.fold_factors())
            skip = conv4(x, *bn4.fold_factors()) if need_skip else x
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
