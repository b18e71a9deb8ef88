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

Two implementations render identical targets: `_encode_single_scan` (a
`lax.scan` over person slots — the original formulation, kept as the parity
oracle) and the default `_encode_single` (fully vectorized over persons —
the 16-step scan serializes ~1 MB steps and measured 7.8 ms/batch at
512²/batch-16 on a v5e, ~5% of the whole train step; the vectorized form
renders the same batch in ~1.5 ms). Win-order tie-breaks are replicated
exactly: every nearest-wins contest resolves to the FIRST person (scan
order) among exact-value ties, and the scale map takes the scale of the
LAST limb-improvement event per joint (see `_encode_single`).
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


def _grids(out_h, out_w, stride):
    s = float(stride)
    gx = jnp.arange(out_w, dtype=jnp.float32) * s + s / 2 - 0.5
    gy = jnp.arange(out_h, dtype=jnp.float32) * s + s / 2 - 0.5
    xx2 = jnp.broadcast_to(gx[None, :], (out_h, out_w))
    yy2 = jnp.broadcast_to(gy[:, None], (out_h, out_w))
    ix2 = jnp.broadcast_to(jnp.arange(out_w, dtype=jnp.float32)[None, :],
                           (out_h, out_w))
    iy2 = jnp.broadcast_to(jnp.arange(out_h, dtype=jnp.float32)[:, None],
                           (out_h, out_w))
    return gx, gy, xx2, yy2, ix2, iy2


def _encode_single(anns, *, sigmas, skeleton, out_h, out_w,
                   cfg: EncoderConfig):
    """Vectorized-over-persons target rendering (default implementation).

    Identical outputs to `_encode_single_scan` (tested): nearest-wins
    contests pick the first person among exact ties (argmin first-index ==
    the scan's strict-improvement rule), and the keypoint-scale map takes
    the joint scale of the person behind the LAST limb-improvement event
    per joint — in the scan that is the last limb (in person order) whose
    running minimum improved, i.e. max over limbs-from-j of each limb's
    winning person index.
    """
    P, J = anns.shape[0], anns.shape[1]
    L = len(skeleton)
    s = float(cfg.stride)
    gx, gy, xx2, yy2, ix2, iy2 = _grids(out_h, out_w, cfg.stride)

    double_sigma2 = 2.0 * cfg.sigma * cfg.sigma
    gaussian_size = 2 * int(np.ceil(
        np.sqrt(-double_sigma2 * np.log(cfg.gaussian_clip)) / cfg.stride))

    jf = jnp.asarray([a for a, _ in skeleton], dtype=jnp.int32)
    jt = jnp.asarray([b for _, b in skeleton], dtype=jnp.int32)
    sig_f = jnp.take(jnp.asarray(sigmas, dtype=jnp.float32), jf)

    px, py, pv, ps = (anns[..., 0], anns[..., 1],
                      anns[..., 2], anns[..., 3])            # (P, J)
    vis = pv > 0

    # ---- Gaussian heatmaps: windowed, clipped, max over persons ------------
    wmask = _window_mask(ix2, iy2, px, py, s, gaussian_size)  # (P, J, Ho, Wo)
    ex = jnp.exp(-(gx[None, None, :] - px[..., None]) ** 2 / double_sigma2)
    ey = jnp.exp(-(gy[None, None, :] - py[..., None]) ** 2 / double_sigma2)
    g = ey[..., :, None] * ex[..., None, :]                   # (P, J, Ho, Wo)
    g = jnp.where(g < cfg.gaussian_clip, 0.0, g)
    g = jnp.where(wmask & vis[..., None, None], g, 0.0)
    hmp = jnp.max(g, axis=0).transpose(1, 2, 0)               # (Ho, Wo, J)

    # ---- jitter offsets: nearest keypoint of any (person, joint) -----------
    jmask = _window_mask(ix2, iy2, px, py, s, cfg.fill_jitter_size)
    dx = px[..., None, None] - xx2                            # (P, J, Ho, Wo)
    dy = py[..., None, None] - yy2
    norm = jnp.sqrt(dx * dx + dy * dy)
    norm = jnp.where(jmask & vis[..., None, None], norm, jnp.inf)
    nf = norm.reshape(P * J, out_h, out_w)
    jmin = jnp.min(nf, axis=0)                                # (Ho, Wo)
    # first-wins among exact ties == the scan's strict-improvement rule
    jbest = jnp.argmin(nf, axis=0)                            # (P*J,) index
    onehot = (jnp.arange(P * J)[:, None, None] == jbest[None])
    sel = lambda v: jnp.sum(jnp.where(onehot, v.reshape(P * J, out_h, out_w),
                                      0.0), axis=0)
    j_off = jnp.where(jnp.isfinite(jmin)[..., None],
                      jnp.stack([sel(dx), sel(dy)], axis=-1), jnp.inf)

    # ---- guiding offsets + scale/pscale: per-limb nearest-wins -------------
    fx, fy, fv = (jnp.take(px, jf, axis=1), jnp.take(py, jf, axis=1),
                  jnp.take(pv, jf, axis=1))                   # (P, L)
    fs = jnp.take(ps, jf, axis=1)
    tx, ty, tv = (jnp.take(px, jt, axis=1), jnp.take(py, jt, axis=1),
                  jnp.take(pv, jt, axis=1))
    lvis = (fv > 0) & (tv > 0)
    omask = _window_mask(ix2, iy2, fx, fy, s, cfg.fill_scale_size)
    odx = tx[..., None, None] - xx2                           # (P, L, Ho, Wo)
    ody = ty[..., None, None] - yy2
    onorm = jnp.sqrt(odx * odx + ody * ody)
    onorm = jnp.where(omask & lvis[..., None, None], onorm, jnp.inf)
    omin = jnp.min(onorm, axis=0)                             # (L, Ho, Wo)
    owinner = jnp.argmin(onorm, axis=0)                       # (L, Ho, Wo)
    any_win = jnp.isfinite(omin)
    p_onehot = (jnp.arange(P)[:, None, None, None] == owinner[None])
    psel = lambda v: jnp.sum(jnp.where(p_onehot, v, 0.0), axis=0)
    o_off = jnp.where(any_win[..., None],
                      jnp.stack([psel(odx), psel(ody)], axis=-1), jnp.inf)

    # keypoint-scale map: the scan writes scmp[:, :, j] at every step whose
    # person improves ANY limb from joint j, so the surviving value belongs
    # to max-over-limbs of the per-limb winning person.
    winner_or = jnp.where(any_win, owinner, -1)               # (L, Ho, Wo)
    fr_mask = (jf[:, None] == jnp.arange(J)[None, :])         # (L, J)
    q_j = jnp.max(jnp.where(fr_mask[:, :, None, None],
                            winner_or[:, None], -1), axis=0)  # (J, Ho, Wo)
    joint_scale = jnp.where(ps >= cfg.min_jscale, ps, jnp.nan)  # (P, J)
    q_onehot = (jnp.arange(P)[:, None, None, None] == q_j[None])  # (P,J,Ho,Wo)
    scale_sel = jnp.sum(jnp.where(q_onehot, joint_scale[..., None, None], 0.0),
                        axis=0)                               # (J, Ho, Wo)
    scmp = jnp.where(q_j >= 0, scale_sel, jnp.nan).transpose(1, 2, 0)

    pscale_val = fs / sig_f[None, :]                          # (P, L)
    psc = jnp.sum(jnp.where(p_onehot, pscale_val[..., None, None], 0.0),
                  axis=0)                                     # (L, Ho, Wo)
    psc = jnp.where(any_win, psc, 1.0)
    pscmp = jnp.broadcast_to(psc.transpose(1, 2, 0)[..., None],
                             (out_h, out_w, L, 2))

    bg = 1.0 - jnp.max(hmp, axis=-1, keepdims=True)
    omp = o_off.transpose(1, 2, 0, 3).reshape(out_h, out_w, 2 * L)
    pscmp = pscmp.reshape(out_h, out_w, 2 * L)
    return Targets(hmp=hmp, bg=bg, jomp=j_off, omp=omp, scmp=scmp,
                   pscmp=pscmp)


def _encode_single_scan(anns, *, sigmas, skeleton, out_h, out_w,
                        cfg: EncoderConfig):
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
