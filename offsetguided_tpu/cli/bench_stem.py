"""Stem-conv formulation shootout on the TPU.

The 7x7 stride-2 stem (reference models/hourglass_104.py:83) is the one
forward op far from roofline: its 3-input-channel contraction starves the
MXU and every C-minor layout materialization pays a 6/128-lane padding tax
(~21x write amplification). This tool measures candidate formulations at
the benchmark shape so the winner is chosen by the hardware, not by theory:

  wfold   -- current production path: W-parity pairs folded into channels
             (free reshape), H keeps stride 2 inside the conv.
  full    -- 2x2 space-to-depth, stride-1 conv on 12 channels.
  plain   -- direct strided conv on the 3-channel image.
  im2col  -- explicit patch extraction (49 strided slices, one concat) and
             a single (N*Ho*Wo, 147) @ (147, 128) MXU matmul; the patch
             tensor is lane-wide (147->pad 256) so no 6/128 write tax.
  patches -- lax.conv_general_dilated_patches + dot (same math, XLA's own
             patch extraction).

Each variant computes conv + bias + relu and is verified against `plain`
before timing.
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


from offsetguided_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('/tmp/jax_bench_cache')


def _torch_pad(k):
    return ((k - 1) // 2,) * 2


def stem_plain(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), padding=(_torch_pad(7), _torch_pad(7)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return jax.nn.relu(y + bias)


def stem_wfold(x, kernel, bias):
    from offsetguided_tpu.models.layers import Conv
    conv = Conv(kernel.shape[-1], (7, 7), strides=(2, 2), use_bias=False,
                dtype=x.dtype, s2d=True)
    y = conv._s2d_conv_wfold(x, kernel)
    return jax.nn.relu(y + bias)


def stem_full(x, kernel, bias):
    from offsetguided_tpu.models.layers import Conv
    conv = Conv(kernel.shape[-1], (7, 7), strides=(2, 2), use_bias=False,
                dtype=x.dtype, s2d=True)
    y = conv._s2d_conv(x, kernel)
    return jax.nn.relu(y + bias)


def stem_im2col(x, kernel, bias):
    """Patch tensor built from 49 shifted strided views, contracted on the
    MXU as one matmul. The patch axis (147) lives in lanes."""
    n, h, w, c = x.shape
    P = 3
    xp = jnp.pad(x, ((0, 0), (P, P + 1), (P, P + 1), (0, 0)))
    ho, wo = h // 2, w // 2
    cols = []
    for dy in range(7):
        for dx in range(7):
            cols.append(jax.lax.slice(
                xp, (0, dy, dx, 0), (n, dy + h, dx + w, c), (1, 2, 2, 1)))
    patches = jnp.concatenate(cols, axis=-1)          # (N, Ho, Wo, 147)
    kmat = kernel.reshape(-1, kernel.shape[-1])       # (147, F)
    y = jnp.einsum('nhwp,pf->nhwf', patches, kmat)
    return jax.nn.relu(y + bias)


def stem_patches(x, kernel, bias):
    n, h, w, c = x.shape
    pat = jax.lax.conv_general_dilated_patches(
        x, (7, 7), (2, 2), padding=(_torch_pad(7), _torch_pad(7)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))   # (N, Ho, Wo, C*49)
    # patches orders features as (c, ky, kx); kernel is (ky, kx, c, f)
    kmat = kernel.transpose(2, 0, 1, 3).reshape(-1, kernel.shape[-1])
    y = jnp.einsum('nhwp,pf->nhwf', pat, kmat)
    return jax.nn.relu(y + bias)


VARIANTS = {'plain': stem_plain, 'wfold': stem_wfold, 'full': stem_full,
            'im2col': stem_im2col, 'patches': stem_patches}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=640)
    ap.add_argument('--features', type=int, default=128)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--from-f32', action='store_true',
                    help='feed an f32 image and cast inside the jitted fn '
                         '(models the real normalize->stem handoff)')
    args = ap.parse_args()

    from offsetguided_tpu.utils.profiling import device_time

    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    img32 = rng.randn(args.batch, args.size, args.size, 3).astype(np.float32)
    kernel = jnp.asarray(
        rng.randn(7, 7, 3, args.features).astype(np.float32) * 0.05, dt)
    bias = jnp.asarray(rng.randn(args.features).astype(np.float32), dt)
    x = jnp.asarray(img32 if args.from_f32 else img32.astype(dt))

    ref = None
    for name, fn in VARIANTS.items():
        f = jax.jit(lambda xx, k, b, fn=fn: fn(xx.astype(dt), k, b))
        try:
            out = np.asarray(f(x, kernel, bias), np.float32)
        except Exception as e:  # noqa: BLE001 - report and keep measuring
            print(f'{name:8s} FAILED: {type(e).__name__}: {e}')
            continue
        if ref is None:
            ref = out
        err = float(np.max(np.abs(out - ref)))
        t = device_time(f, x, kernel, bias)
        gf = (args.batch * (args.size // 2) ** 2 * args.features
              * 147 * 2) / 1e9
        print(f'{name:8s} {t * 1e3:7.3f} ms   {gf / t / 1e3:6.1f} TF/s '
              f'  max|d|={err:.3e}')


if __name__ == '__main__':
    main()
