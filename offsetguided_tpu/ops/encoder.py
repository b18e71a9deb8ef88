"""Ground-truth target rendering (heatmaps / jitter offsets / guiding offsets /
scale maps) as batched, jittable JAX.

The reference renders GT per sample with windowed NumPy loops inside DataLoader
workers (encoder/heatmap.py:95-255, encoder/offset.py:72-198). On TPU we render
the full output grid directly on device: a `lax.scan` over a fixed number of
padded person slots, with all keypoint/limb channels vectorized per step, using
the same window bounds, grid-center alignment (`i*stride + stride/2 - 0.5`) and
nearest-wins overlap rules as the reference. Unlabeled texels keep the
reference's sentinel encoding (+inf offsets, NaN scales) so the losses'
isfinite masking semantics carry over unchanged.

Scan order is person-major (the reference loops channel/limb-major); the only
behavioral difference is the winner of *exact* float ties in the nearest-wins
contests, which is measure-zero for real annotations.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import EncoderConfig


class Targets(NamedTuple):
    """Per-sample GT tensors at output stride, channels-last."""
    hmp: jax.Array     # (Ho, Wo, J) Gaussian keypoint heatmaps
    bg: jax.Array      # (Ho, Wo, 1) background = 1 - max_j hmp
    jomp: jax.Array    # (Ho, Wo, 2) jitter offset to nearest keypoint (+inf bg)
    omp: jax.Array     # (Ho, Wo, 2L) guiding offsets, interleaved x/y (+inf bg)
    scmp: jax.Array    # (Ho, Wo, J) keypoint scale at from-joints (NaN bg)
    pscmp: jax.Array   # (Ho, Wo, 2L) instance scales (init 1.0)


def _window_mask(ix, iy, jx, jy, stride, size):
    """Boolean fill window around a joint, replicating the reference's
    rounded half-open slices (encoder/heatmap.py:154-175). `ix`/`iy` are
    integer cell-index grids of shape (Ho, Wo); `jx`/`jy` may be any batched
    shape and broadcast against them."""
    x_min = jnp.maximum(jnp.round(jx / stride - size / 2), 0.0)
    x_max = jnp.round(jx / stride + size / 2)
    y_min = jnp.maximum(jnp.round(jy / stride - size / 2), 0.0)
    y_max = jnp.round(jy / stride + size / 2)
    sh = jx.shape + (1, 1)
    return ((ix >= x_min.reshape(sh)) & (ix < x_max.reshape(sh)) &
            (iy >= y_min.reshape(sh)) & (iy < y_max.reshape(sh)))


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w', 'cfg',
                                             'skeleton'))
def encode_targets(anns: jax.Array, sigmas: jax.Array, skeleton,
                   out_h: int, out_w: int, cfg: EncoderConfig) -> Targets:
    """Render GT targets for a batch.

    Args:
        anns: (N, P, J, 4) padded person annotations [x, y, v, keypoint_scale]
            in input-resolution coordinates; v <= 0 marks missing keypoints and
            padding slots.
        sigmas: (J,) OKS sigmas for pscale normalization.
        skeleton: static tuple of (from, to) joint index pairs.
        out_h, out_w: output grid size (input_size // stride).
    Returns:
        Targets with batch dimension prepended to every leaf.
    """
    skeleton = tuple(map(tuple, skeleton))
    fn = functools.partial(_encode_single, sigmas=jnp.asarray(sigmas),
                           skeleton=skeleton, out_h=out_h, out_w=out_w, cfg=cfg)
    return jax.vmap(fn)(anns)


def _encode_single(anns, *, sigmas, skeleton, out_h, out_w, cfg: EncoderConfig):
    J = anns.shape[1]
    L = len(skeleton)
    s = float(cfg.stride)
    gx = jnp.arange(out_w, dtype=jnp.float32) * s + s / 2 - 0.5
    gy = jnp.arange(out_h, dtype=jnp.float32) * s + s / 2 - 0.5
    xx = gx[None, :]                       # broadcast row (1, Wo)
    yy = gy[:, None]                       # broadcast col (Ho, 1)
    xx2 = jnp.broadcast_to(xx, (out_h, out_w))
    yy2 = jnp.broadcast_to(yy, (out_h, out_w))
    # integer cell-index grids for window membership tests
    ix2 = jnp.broadcast_to(jnp.arange(out_w, dtype=jnp.float32)[None, :],
                           (out_h, out_w))
    iy2 = jnp.broadcast_to(jnp.arange(out_h, dtype=jnp.float32)[:, None],
                           (out_h, out_w))

    double_sigma2 = 2.0 * cfg.sigma * cfg.sigma
    # same window radius as encoder/heatmap.py:111-112
    gaussian_size = 2 * int(np.ceil(
        np.sqrt(-double_sigma2 * np.log(cfg.gaussian_clip)) / cfg.stride))

    jf = jnp.asarray([a for a, _ in skeleton], dtype=jnp.int32)
    jt = jnp.asarray([b for _, b in skeleton], dtype=jnp.int32)
    sig_f = jnp.take(jnp.asarray(sigmas, dtype=jnp.float32), jf)

    def person_step(carry, person):
        hmp, j_best, j_off, o_best, o_off, scmp, pscmp = carry
        px, py, pv, ps = person[:, 0], person[:, 1], person[:, 2], person[:, 3]
        vis = pv > 0                                   # (J,)

        # ---- Gaussian heatmaps: windowed, clipped, max-combined ------------
        wmask = _window_mask(ix2, iy2, px, py, s, gaussian_size)  # (J, Ho, Wo)
        ex = jnp.exp(-(xx - px[:, None]) ** 2 / double_sigma2)    # (J, Wo)
        ey = jnp.exp(-(yy.T - py[:, None]) ** 2 / double_sigma2)  # (J, Ho)
        g = ey[:, :, None] * ex[:, None, :]                       # (J, Ho, Wo)
        g = jnp.where(g < cfg.gaussian_clip, 0.0, g)
        g = jnp.where(wmask & vis[:, None, None], g, 0.0)
        hmp = jnp.maximum(hmp, g.transpose(1, 2, 0))

        # ---- jitter offsets: nearest keypoint of any type ------------------
        jmask = _window_mask(ix2, iy2, px, py, s, cfg.fill_jitter_size)
        dx = px[:, None, None] - xx2[None]                        # (J, Ho, Wo)
        dy = py[:, None, None] - yy2[None]
        norm = jnp.sqrt(dx * dx + dy * dy)
        norm = jnp.where(jmask & vis[:, None, None], norm, jnp.inf)
        jbest_k = jnp.argmin(norm, axis=0)                        # (Ho, Wo)
        jmin = jnp.min(norm, axis=0)
        win = jmin < j_best
        # select the winning joint's offsets via a one-hot reduce: spatial
        # take_along_axis gathers are pathologically slow on TPU
        onehot = (jnp.arange(J)[:, None, None] == jbest_k[None])  # (J, Ho, Wo)
        sel = lambda v: jnp.sum(jnp.where(onehot, v, 0.0), axis=0)
        j_off = jnp.where(win[..., None],
                          jnp.stack([sel(dx), sel(dy)], axis=-1), j_off)
        j_best = jnp.where(win, jmin, j_best)

        # ---- guiding offsets + scale/pscale: per-limb nearest-wins ---------
        fx, fy, fv, fs = px[jf], py[jf], pv[jf], ps[jf]           # (L,)
        tx, ty, tv = px[jt], py[jt], pv[jt]
        lvis = (fv > 0) & (tv > 0)
        omask = _window_mask(ix2, iy2, fx, fy, s, cfg.fill_scale_size)
        odx = tx[:, None, None] - xx2[None]                       # (L, Ho, Wo)
        ody = ty[:, None, None] - yy2[None]
        onorm = jnp.sqrt(odx * odx + ody * ody)
        onorm = jnp.where(omask & lvis[:, None, None], onorm, jnp.inf)
        owin = onorm < o_best                                     # (L, Ho, Wo)
        o_off = jnp.where(owin[..., None],
                          jnp.stack([odx, ody], axis=-1), o_off)
        o_best = jnp.where(owin, onorm, o_best)
        # keypoint scale at the from-joint channel (NaN below min_jscale).
        # Limbs sharing a from-joint carry the same person scale, so reduce
        # per-limb wins to per-joint wins (one-hot contraction avoids a
        # duplicate-index scatter).
        fr_onehot = (jf[:, None] == jnp.arange(J)[None, :]).astype(jnp.float32)
        win_per_joint = jnp.einsum(
            'lj,lhw->jhw', fr_onehot, owin.astype(jnp.float32)) > 0
        joint_scale = jnp.where(ps >= cfg.min_jscale, ps, jnp.nan)  # (J,)
        scmp = jnp.where(win_per_joint.transpose(1, 2, 0),
                         joint_scale[None, None, :], scmp)
        pscale_val = fs / sig_f                                   # (L,)
        pscmp = jnp.where(owin.transpose(1, 2, 0)[..., None],
                          pscale_val[None, None, :, None], pscmp)
        return (hmp, j_best, j_off, o_best, o_off, scmp, pscmp), None

    init = (
        jnp.zeros((out_h, out_w, J), jnp.float32),
        jnp.full((out_h, out_w), jnp.inf, jnp.float32),
        jnp.full((out_h, out_w, 2), jnp.inf, jnp.float32),
        jnp.full((L, out_h, out_w), jnp.inf, jnp.float32),
        jnp.full((L, out_h, out_w, 2), jnp.inf, jnp.float32),
        jnp.full((out_h, out_w, J), jnp.nan, jnp.float32),
        jnp.full((out_h, out_w, L, 2), 1.0, jnp.float32),
    )
    (hmp, _, j_off, _, o_off, scmp, pscmp), _ = jax.lax.scan(
        person_step, init, anns)

    bg = 1.0 - jnp.max(hmp, axis=-1, keepdims=True)
    omp = o_off.transpose(1, 2, 0, 3).reshape(out_h, out_w, 2 * L)
    pscmp = pscmp.reshape(out_h, out_w, 2 * L)
    return Targets(hmp=hmp, bg=bg, jomp=j_off, omp=omp, scmp=scmp, pscmp=pscmp)


def downscale_mask(mask_miss: jax.Array, cfg: EncoderConfig) -> jax.Array:
    """Input-resolution mask (N, H, W) float in [0,1] (or uint8 in [0,255],
    as the host pipeline ships it) -> bool (N, Ho, Wo, 1).

    The reference bicubic-downscales the 0/255 mask and thresholds at 0.7
    (encoder/heatmap.py:56-60). Downsampling by the integer stride with
    half-pixel alignment reduces to a strided 4-tap cubic filter.
    """
    from .resize import _cubic_kernel
    if mask_miss.dtype == jnp.uint8:
        mask_miss = mask_miss.astype(jnp.float32) / 255.0
    s = cfg.stride
    # single-phase downsample: src = (i + 0.5) * s - 0.5 = i*s + (s-1)/2,
    # so every output taps the same 4 relative input positions.
    base = int(np.floor((s - 1) / 2.0))
    frac = (s - 1) / 2.0 - base
    rel = np.arange(-1, 3)
    w = _cubic_kernel(rel - frac)
    x = mask_miss
    for axis in (1, 2):
        n_out = x.shape[axis] // s
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 3)
        xp = jnp.pad(x, pad, mode='edge')
        acc = None
        for t, wt in enumerate(w):
            sl = [slice(None)] * x.ndim
            start = base + t  # original index i*s + base - 1 + t, shifted by pad
            sl[axis] = slice(start, start + n_out * s, s)
            term = xp[tuple(sl)] * float(wt)
            acc = term if acc is None else acc + term
        x = acc
    return (x > cfg.mask_miss_threshold)[..., None]
