"""Integer-factor upsampling with PyTorch-compatible semantics, TPU-style.

The reference decoder enlarges heatmaps x4 with `torch.nn.functional.interpolate`
(bicubic, align_corners=False) and offsets with bilinear (reference:
decoder/factory.py:74-88). Coordinate parity of the decoded keypoints depends on
reproducing those exact filters (SURVEY.md "hard parts"), so we implement them
directly instead of using `jax.image.resize` (whose cubic kernel uses A=-0.5,
while torch uses the Catmull-Rom-like A=-0.75 cubic convolution kernel).

TPU-first design: for an integer factor `s`, the half-pixel source grid
`src = (dst + 0.5)/s - 0.5` has exactly `s` distinct fractional phases, so
upsampling is a fixed (s x taps) weight table applied to edge-padded shifted
slices -- pure elementwise multiply/adds that XLA fuses, no gathers, static
shapes. Boundary handling replicates torch's index clamping (edge replication).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(d: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel; a=-0.75 matches torch's bicubic."""
    d = np.abs(d)
    w = np.where(
        d <= 1.0,
        (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0,
        np.where(d < 2.0, a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a, 0.0))
    return w


@functools.lru_cache(maxsize=32)
def _phase_table(factor: int, method: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-phase (tap_offsets, weights).

    Returns `offsets` of shape (n_taps,) -- tap positions relative to the source
    cell index -- and `weights` of shape (factor, n_taps).
    """
    phases = (np.arange(factor) + 0.5) / factor - 0.5  # source frac per phase
    base = np.floor(phases).astype(np.int64)
    frac = phases - base
    if method == 'bicubic':
        rel = np.arange(-1, 3)  # taps around floor(src)
        # distance of each tap from the sample point
        d = rel[None, :] - frac[:, None]
        weights = _cubic_kernel(d)
    elif method == 'bilinear':
        rel = np.arange(0, 2)
        d = np.abs(rel[None, :] - frac[:, None])
        weights = np.maximum(0.0, 1.0 - d)
    elif method == 'nearest':
        rel = np.arange(0, 1)
        weights = np.ones((factor, 1))
        base = np.floor(phases + 0.5).astype(np.int64)  # round, not floor
    else:
        raise ValueError(f'unknown resize method: {method}')
    # absolute tap offset per phase = base + rel; fold base into offsets by
    # using the min base and shifting weights columns accordingly.
    min_off = int(base.min() + rel.min())
    max_off = int(base.max() + rel.max())
    offsets = np.arange(min_off, max_off + 1)
    full = np.zeros((factor, offsets.size))
    for p in range(factor):
        for t, r in enumerate(rel):
            full[p, base[p] + r - min_off] += weights[p, t]
    return offsets, full


def upsample_axis(x: jax.Array, axis: int, factor: int, method: str) -> jax.Array:
    """Upsample one axis by an integer factor with half-pixel alignment."""
    if factor == 1:
        return x
    offsets, weights = _phase_table(factor, method)
    axis = axis % x.ndim
    n = x.shape[axis]
    lo, hi = int(-offsets.min()), int(offsets.max())
    # edge-replicate pad along `axis`
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (lo, hi)
    xp = jnp.pad(x, pad_width, mode='edge')

    out_parts = []
    w = jnp.asarray(weights, dtype=x.dtype)
    for p in range(factor):
        acc = None
        for t, off in enumerate(offsets):
            wt = w[p, t]
            if float(weights[p, t]) == 0.0:
                continue
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(lo + int(off), lo + int(off) + n)
            term = xp[tuple(sl)] * wt
            acc = term if acc is None else acc + term
        out_parts.append(acc)
    # interleave phases: stack on a new axis right after `axis`, then merge
    stacked = jnp.stack(out_parts, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = n * factor
    return stacked.reshape(new_shape)


def upsample2d(x: jax.Array, factor: int, method: str = 'bicubic',
               h_axis: int = 1, w_axis: int = 2) -> jax.Array:
    """Upsample two spatial axes by `factor` (torch F.interpolate parity).

    Works on any layout; defaults to NHWC.
    """
    x = upsample_axis(x, h_axis, factor, method)
    x = upsample_axis(x, w_axis, factor, method)
    return x


@functools.lru_cache(maxsize=32)
def _upsample_matrix(n: int, factor: int, method: str) -> np.ndarray:
    """(n, n*factor) dense interpolation matrix with edge-clamped taps.

    Row-applied: out = U_out^T @ x along the target axis. Equivalent to the
    phase-table path but expressed as a matmul -- on TPU this rides the MXU
    (~bandwidth-free for small n) instead of 4x-per-phase VPU slices.
    """
    offsets, weights = _phase_table(factor, method)
    U = np.zeros((n, n * factor), dtype=np.float32)
    for i in range(n):
        for p in range(factor):
            for t, off in enumerate(offsets):
                src = min(max(i + int(off), 0), n - 1)
                U[src, i * factor + p] += weights[p, t]
    return U


def upsample2d_matmul(x: jax.Array, factor: int,
                      method: str = 'bicubic') -> jax.Array:
    """NHWC 2D upsampling as two dense contractions (TPU/MXU fast path).

    Bit-equivalent semantics to `upsample2d` up to float summation order.
    """
    if factor == 1:
        return x
    n, h, w, c = x.shape
    uh = jnp.asarray(_upsample_matrix(h, factor, method))
    uw = jnp.asarray(_upsample_matrix(w, factor, method))
    # (N,H,W,C) -> (N,H',W,C): contract H with uh. HIGHEST precision is
    # load-bearing: TPU f32 matmuls truncate inputs to bf16 at DEFAULT,
    # which perturbs upsampled peak values/locations enough to cost
    # ~0.04 oracle AP on the hard benchmark (measured; the reference's
    # torch F.interpolate is full fp32).
    y = jnp.einsum('nhwc,hH->nHwc', x, uh,
                   preferred_element_type=jnp.float32,
                   precision='highest')
    y = jnp.einsum('nHwc,wW->nHWc', y, uw,
                   preferred_element_type=jnp.float32,
                   precision='highest')
    return y
