"""Device-side training augmentation: batched affine warp + photometric.

The reference augments on the host in DataLoader workers
(transforms/affine.py:107-278 via cv2.warpAffine, transforms/image.py) — on
a TPU host that serializes JPEG-rate work onto a few cores and starves the
chips. Here the host keeps only what it must (JPEG decode, RLE mask render,
RANDOMNESS — all parameters are sampled host-side so batch contents stay
identical for any loader-worker count) and the pixel work moves into the
training step's jitted program:

- `affine_sample`: batched 16-tap bicubic (A=-0.75, cv2 INTER_CUBIC's
  kernel) warp with cv2 BORDER_CONSTANT semantics; per-sample valid (h, w)
  bounds so the fixed-shape raw canvas's padding never leaks into borders.
- `transform_annotations`: the same 3x3 matrix applied to keypoints, with
  per-sample L/R channel swap under flip and off-canvas invalidation —
  bit-identical math to the host path (data/transforms.py:241-263).
- `photometric`: cv2-weight grayscale and HSV tint, with all random shifts
  sampled on the host and shipped as per-sample scalars.

Pixel parity with cv2 is within quantization (cv2 interpolates in fixed
point; we compute in f32 and saturate-round to uint8) — geometric parity of
annotations is exact, which is what GT encoding consumes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_w(d: jax.Array) -> jax.Array:
    """jnp cubic convolution weights, a=-0.75 (ops/resize.py:25-33)."""
    a = -0.75
    d = jnp.abs(d)
    return jnp.where(
        d <= 1.0,
        (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0,
        jnp.where(d < 2.0,
                  a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a,
                  0.0))


def _affine_sample_taps(images: jax.Array, mats_dst2src: jax.Array,
                        out_hw: Tuple[int, int], border_value,
                        valid_hw: jax.Array) -> jax.Array:
    """16 separate 1x1xC-slice gathers (one per bicubic tap).

    Reference formulation kept as the small-image fallback and the
    differential oracle for the patch-gather path below: on TPU each
    scalar-slice gather wastes the 128-wide lane dim on C<=4 channels
    (measured 481 ms for a 16x640->512 batch), so `affine_sample` gathers
    whole 4x4 patches instead.
    """
    n, h, w, c = images.shape
    oh, ow = out_hw
    vh = valid_hw[:, 0].astype(jnp.float32)[:, None, None]
    vw = valid_hw[:, 1].astype(jnp.float32)[:, None, None]

    ys, xs = jnp.mgrid[0:oh, 0:ow]
    xs = xs.astype(jnp.float32)[None]
    ys = ys.astype(jnp.float32)[None]
    m = mats_dst2src.astype(jnp.float32)
    sx = (m[:, 0, 0, None, None] * xs + m[:, 0, 1, None, None] * ys
          + m[:, 0, 2, None, None])
    sy = (m[:, 1, 0, None, None] * xs + m[:, 1, 1, None, None] * ys
          + m[:, 1, 2, None, None])

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    border = jnp.broadcast_to(
        jnp.asarray(border_value, jnp.float32).reshape(1, 1, 1, -1),
        (1, 1, 1, c))
    # gather in the INPUT dtype (uint8 stays uint8 through the gather —
    # 4x less HBM than widening the whole canvas first); widen per tap,
    # where the gathered slab is only oh*ow*c
    flat = images.reshape(n, h * w, c)

    out = jnp.zeros((n, oh, ow, c), jnp.float32)
    for dy in range(-1, 3):
        wy = _cubic_w(fy - dy)
        ty = y0 + dy
        for dx in range(-1, 3):
            wgt = (wy * _cubic_w(fx - dx))[..., None]
            tx = x0 + dx
            inb = ((tx >= 0) & (tx < vw) & (ty >= 0) & (ty < vh))[..., None]
            ix = jnp.clip(tx, 0, w - 1).astype(jnp.int32)
            iy = jnp.clip(ty, 0, h - 1).astype(jnp.int32)
            idx = (iy * w + ix).reshape(n, oh * ow, 1)
            val = jnp.take_along_axis(flat, idx, axis=1).reshape(
                n, oh, ow, c).astype(jnp.float32)
            out = out + wgt * jnp.where(inb, val, border)
    return out


def affine_sample(images: jax.Array, mats_dst2src: jax.Array,
                  out_hw: Tuple[int, int], border_value,
                  valid_hw: jax.Array | None = None,
                  row_chunk: int = 64) -> jax.Array:
    """Batched bicubic affine sampling (cv2.warpAffine INTER_CUBIC +
    BORDER_CONSTANT equivalent).

    images: (N, H, W, C) uint8 or float; mats_dst2src: (N, 2, 3) mapping
    OUTPUT pixel coords to source coords (cv2 warps with the inverse of the
    forward matrix; invert on the host). border_value: scalar or (C,).
    valid_hw: (N, 2) int — actual (h, w) of each sample inside the fixed
    canvas; taps outside it read the border constant, so right/down padding
    in the raw canvas is invisible.

    TPU formulation: ONE `lax.gather` of 4x4xC patches per output chunk
    (instead of 16 scalar-slice gathers, which pay the per-position gather
    cost 16x and waste the lane dim on C<=4 channels), then the separable
    bicubic weights applied as an einsum over the patch. Per-tap weights are
    recomputed from the CLIPPED patch's actual row/col indices, so border
    clipping keeps cv2's exact border-constant semantics: footprint taps
    outside the image always land outside valid_hw and get weight 0, with
    the border color absorbing `1 - sum(valid weights)` (the Keys cubic
    kernel is a partition of unity). Output rows are processed in
    `row_chunk` slabs under `lax.scan` to bound the patch tensor.
    ~1.8x over the tap loop on v5e at train shapes (BENCHMARKS.md round 4).
    """
    n, h, w, c = images.shape
    oh, ow = out_hw
    if valid_hw is None:
        valid_hw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (n, 1))
    if h < 4 or w < 4:   # gather slice (4,4) would exceed the operand
        return _affine_sample_taps(images, mats_dst2src, out_hw,
                                   border_value, valid_hw)

    vh = valid_hw[:, 0].astype(jnp.float32)[:, None, None]
    vw = valid_hw[:, 1].astype(jnp.float32)[:, None, None]
    m = mats_dst2src.astype(jnp.float32)
    border = jnp.asarray(border_value, jnp.float32).reshape(1, 1, -1)
    border = jnp.broadcast_to(border, (1, 1, c))

    chunk = min(row_chunk, oh)
    n_chunks = -(-oh // chunk)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    taps = jnp.arange(4, dtype=jnp.float32)

    def one_chunk(_, y_start):
        ys, xs = jnp.mgrid[0:chunk, 0:ow]
        ys = ys.astype(jnp.float32)[None] + y_start
        xs = xs.astype(jnp.float32)[None]
        sx = (m[:, 0, 0, None, None] * xs + m[:, 0, 1, None, None] * ys
              + m[:, 0, 2, None, None]).reshape(n, -1)
        sy = (m[:, 1, 0, None, None] * xs + m[:, 1, 1, None, None] * ys
              + m[:, 1, 2, None, None]).reshape(n, -1)
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        sy0 = jnp.clip(y0 - 1.0, 0.0, float(h - 4))
        sx0 = jnp.clip(x0 - 1.0, 0.0, float(w - 4))
        starts = jnp.stack([sy0, sx0], axis=-1).astype(jnp.int32)  # [n,P,2]
        # actual row/col index of each patch tap; weights from true distance
        ry = sy0[:, :, None] + taps                                # [n,P,4]
        rx = sx0[:, :, None] + taps
        wy = _cubic_w(sy[:, :, None] - ry) * ((ry >= 0) & (ry < vh))
        wx = _cubic_w(sx[:, :, None] - rx) * ((rx >= 0) & (rx < vw))

        def g(im, st):
            return jax.lax.gather(im, st, dnums, slice_sizes=(4, 4, c))

        patches = jax.vmap(g)(images, starts)                      # [n,P,4,4,c]
        val = jnp.einsum('npabc,npa,npb->npc',
                         patches.astype(jnp.float32), wy, wx)
        covered = wy.sum(-1) * wx.sum(-1)
        out = val + border * (1.0 - covered)[..., None]
        return _, out.reshape(n, chunk, ow, c)

    _, chunks = jax.lax.scan(
        one_chunk, None,
        jnp.arange(n_chunks, dtype=jnp.float32) * chunk)
    out = chunks.transpose(1, 0, 2, 3, 4).reshape(n, n_chunks * chunk, ow, c)
    return out[:, :oh]


def warp_slope_bound(aug_cfg) -> float:
    """Static bound on |dst->src linear coefficients| for an
    `AugmentationConfig`: the inverse warp of rotate(theta) @ scale(s) @
    stretch(f) has entries bounded by (|cos|+|sin|)/(s*f) <=
    sqrt(2)/(min_scale*min_stretch). Used to size `affine_sample_tiled`'s
    static source windows."""
    return float(np.sqrt(2.0)
                 / (aug_cfg.min_scale * min(aug_cfg.min_stretch, 1.0)))


def affine_sample_tiled(images: jax.Array, mats_dst2src: jax.Array,
                        out_hw: Tuple[int, int], border_value,
                        valid_hw: jax.Array | None = None,
                        slope_bound: float = 2.0,
                        row_tile: int = 8, lane_chunk: int = 64) -> jax.Array:
    """Bicubic affine warp as windowed banded MATMULS (no per-pixel gather).

    Same contract and tap math as `affine_sample` (cv2 INTER_CUBIC +
    BORDER_CONSTANT, valid_hw border masking), different TPU formulation:
    the per-pixel 4x4-patch `lax.gather` (~60-cycle descriptor per output
    position; 267 ms/step at 512^2/batch-16, 64% of the device-aug train
    step — BENCHMARKS.md round 4) is replaced by

      1. ONE batched `dynamic_slice` per output tile: a (R, Cw) source
         window per sample bounded statically by `slope_bound` (max abs
         dst->src linear coefficient: sqrt(2)/min_scale for the shipped
         rotate+scale augmentations) — 16 descriptors per tile instead of
         16k per-position descriptors;
      2. the horizontal 4-tap stage as a dense banded-weight matmul
         (window @ Wc^T on the MXU at HIGHEST precision: uint8 pixel
         values are bf16-exact, so only the f32 weights need the passes);
      3. the vertical 4-tap stage as a banded-weight elementwise reduce
         on the VPU (the band matrix G is per-lane, so no matmul form).

    Border-constant semantics fall out exactly as in `affine_sample`:
    clipped/invalid taps get weight 0 at construction and the border color
    absorbs `1 - coverage` (Keys kernel is a partition of unity).

    `slope_bound` is the caller's contract: every |m00|,|m01|,|m10|,|m11|
    must be <= it (window sizes derive from it statically). Windows are
    clamped to the image, so a bound >= the actual coefficients is always
    safe, never wrong.
    """
    n, h, w, c = images.shape
    oh, ow = out_hw
    if valid_hw is None:
        valid_hw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (n, 1))

    ty, cx = row_tile, lane_chunk
    n_ty = -(-oh // ty)
    n_cx = -(-ow // cx)
    # static window extents from the slope bound (+4-tap footprint, +1 floor)
    span_r = int(np.ceil(slope_bound * (cx - 1) + slope_bound * (ty - 1))) + 5
    span_c = span_r
    R = min(span_r, h)
    Cw = min(span_c, w)

    vh = valid_hw[:, 0].astype(jnp.float32)[:, None, None]     # [n,1,1]
    vw = valid_hw[:, 1].astype(jnp.float32)[:, None, None]
    m = mats_dst2src.astype(jnp.float32)
    border = jnp.asarray(border_value, jnp.float32).reshape(1, -1)
    border = jnp.broadcast_to(border, (1, c)).astype(jnp.float32)

    # planar (N, C, H, W) uint8: window slices then have the contraction
    # dim (window columns) minor, and only the window is widened to f32
    imgs_p = images.transpose(0, 3, 1, 2)
    taps = jnp.arange(4, dtype=jnp.float32)

    def one_tile(_, idx):
        ti = idx // n_cx
        ci = idx % n_cx
        y0 = (ti * ty).astype(jnp.float32)
        x0 = (ci * cx).astype(jnp.float32)
        ys = y0 + jnp.arange(ty, dtype=jnp.float32)[:, None]    # [ty,1]
        xs = x0 + jnp.arange(cx, dtype=jnp.float32)[None, :]    # [1,cx]
        sx = (m[:, 0, 0, None, None] * xs + m[:, 0, 1, None, None] * ys
              + m[:, 0, 2, None, None])                          # [n,ty,cx]
        sy = (m[:, 1, 0, None, None] * xs + m[:, 1, 1, None, None] * ys
              + m[:, 1, 2, None, None])
        rx0 = jnp.floor(sx) - 1.0
        ry0 = jnp.floor(sy) - 1.0
        r0 = jnp.clip(jnp.min(ry0, axis=(1, 2)), 0.0, float(h - R))
        c0 = jnp.clip(jnp.min(rx0, axis=(1, 2)), 0.0, float(w - Cw))
        r0i = r0.astype(jnp.int32)
        c0i = c0.astype(jnp.int32)

        win = jax.vmap(
            lambda im, r, cc: jax.lax.dynamic_slice(im, (0, r, cc),
                                                    (c, R, Cw)))(
            imgs_p, r0i, c0i).astype(jnp.float32)                # [n,c,R,Cw]

        # horizontal banded weights: Wc[n,ty,cx,Cw]
        rx = rx0[..., None] + taps                               # [n,ty,cx,4]
        ry = ry0[..., None] + taps
        wx = _cubic_w(sx[..., None] - rx) * (
            (rx >= 0) & (rx < vw[..., None]))                    # [n,ty,cx,4]
        wy = _cubic_w(sy[..., None] - ry) * (
            (ry >= 0) & (ry < vh[..., None]))
        col_io = jnp.arange(Cw, dtype=jnp.float32)               # [Cw]
        # one-hot over the window column for each tap, weight-summed
        rxw = rx - c0[:, None, None, None]                       # [n,ty,cx,4]
        wc = jnp.sum(
            wx[..., None] * (rxw[..., None] == col_io),
            axis=3)                                              # [n,ty,cx,Cw]

        # MXU: column-mix every window row against the band matrix.
        # HIGHEST so the f32 weights are not truncated (pixel VALUES are
        # uint8 -> bf16-exact; the decode-upsample precision defect showed
        # DEFAULT truncates value-carrying matmuls, BENCHMARKS.md round 4)
        crow = jnp.einsum('ncrw,nyxw->nyxrc', win, wc,
                          precision=jax.lax.Precision.HIGHEST)   # [n,ty,cx,R,c]

        # VPU: vertical banded reduce (G is per-lane -> no matmul form)
        row_io = jnp.arange(R, dtype=jnp.float32)                # [R]
        ryw = ry - r0[:, None, None, None]                       # [n,ty,cx,4]
        g = jnp.sum(
            wy[..., None] * (ryw[..., None] == row_io),
            axis=3)                                              # [n,ty,cx,R]
        val = jnp.sum(crow * g[..., None], axis=3)               # [n,ty,cx,c]

        coverage = jnp.sum(wy, axis=-1) * jnp.sum(wx, axis=-1)   # [n,ty,cx]
        out = val + border[None, None] * (1.0 - coverage)[..., None]
        return _, out

    _, tiles = jax.lax.scan(
        one_tile, None, jnp.arange(n_ty * n_cx, dtype=jnp.int32))
    # tiles: [n_ty*n_cx, n, ty, cx, c] -> [n, oh_pad, ow_pad, c]
    tiles = tiles.reshape(n_ty, n_cx, n, ty, cx, c)
    out = tiles.transpose(2, 0, 3, 1, 4, 5).reshape(
        n, n_ty * ty, n_cx * cx, c)
    return out[:, :oh, :ow]


def transform_annotations(anns: jax.Array, mats: jax.Array,
                          scale_xy: jax.Array, flips: jax.Array,
                          left_index: Sequence[int],
                          right_index: Sequence[int],
                          out_size: int) -> jax.Array:
    """Forward affine on keypoints, exactly the host path
    (data/transforms.py:241-263): xy' = M @ [x, y, 1], per-keypoint scale
    *= sqrt(sx*sy), L/R channel swap under flip, off-canvas invalidation.

    anns: (N, P, J, 4) [x, y, v, scale]; mats: (N, 3, 3) forward (src->dst);
    scale_xy: (N, 2); flips: (N,) bool.
    """
    m = mats.astype(jnp.float32)
    x = anns[..., 0]
    y = anns[..., 1]
    nx = (m[:, 0, 0, None, None] * x + m[:, 0, 1, None, None] * y
          + m[:, 0, 2, None, None])
    ny = (m[:, 1, 0, None, None] * x + m[:, 1, 1, None, None] * y
          + m[:, 1, 2, None, None])
    ks = anns[..., 3] * jnp.sqrt(scale_xy[:, 0] * scale_xy[:, 1])[:, None, None]
    out = jnp.stack([nx, ny, anns[..., 2], ks], axis=-1)

    j = out.shape[2]
    perm = np.arange(j)
    perm[list(left_index)] = list(right_index)
    perm[list(right_index)] = list(left_index)
    swapped = out[:, :, perm, :]
    out = jnp.where(flips[:, None, None, None], swapped, out)

    off = ((out[..., 0] <= 0) | (out[..., 1] <= 0)
           | (out[..., 0] > out_size) | (out[..., 1] > out_size))
    out = out.at[..., 2].set(jnp.where(off, 0.0, out[..., 2]))
    # person rows that are all-zero are PADDING (the host pads after the
    # warp, so padded rows must stay zero, not be pushed through the matrix)
    padding = jnp.all(anns == 0, axis=(2, 3))
    return jnp.where(padding[:, :, None, None], 0.0, out)


def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """float RGB [0,255] -> (H in [0,360), S in [0,1], V in [0,255])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h = jnp.where(d == 0, 0.0, h * 60.0) % 360.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    hh = (h % 360.0) / 60.0
    i = jnp.floor(hh)
    f = hh - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def photometric(images: jax.Array, grays: jax.Array,
                tints: jax.Array) -> jax.Array:
    """Grayscale + HSV tint, matching the host order (data/pipeline.py):
    gray first, then tint. images: (N, H, W, 3) float [0,255];
    grays: (N,) bool; tints: (N, 4) float — [apply(0/1), dh_degrees,
    ds (cv2 S units, /255), dv] sampled on the host
    (data/transforms.py:282-288 draws dh in half-degrees*2=degrees... cv2's
    H channel is degrees/2, so its randint(-10,11) shift is ±20 DEGREES;
    ds/dv are cv2 uint8 channel shifts).
    """
    y = (0.299 * images[..., 0] + 0.587 * images[..., 1]
         + 0.114 * images[..., 2])
    gray_img = jnp.repeat(y[..., None], 3, axis=-1)
    images = jnp.where(grays[:, None, None, None], gray_img, images)

    hsv = _rgb_to_hsv(images)
    h = (hsv[..., 0] + tints[:, 1, None, None] * 2.0) % 360.0
    s = jnp.clip(hsv[..., 1] + tints[:, 2, None, None] / 255.0, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] + tints[:, 3, None, None], 0.0, 255.0)
    tinted = _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))
    apply = tints[:, 0, None, None, None] > 0.5
    return jnp.where(apply, tinted, images)


def augment_batch(raw_images: jax.Array, raw_masks: jax.Array,
                  anns: jax.Array, mats: jax.Array, mats_inv: jax.Array,
                  scale_xy: jax.Array, flips: jax.Array, grays: jax.Array,
                  tints: jax.Array, valid_hw: jax.Array, out_size: int,
                  left_index: Sequence[int], right_index: Sequence[int],
                  warp_impl: str = 'tiled', slope_bound: float = 3.0
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full device augmentation: warp + photometric + annotation transform.

    raw_images: (N, C0, C0, 3) uint8 raw canvas (top-left anchored);
    raw_masks: (N, C0, C0) uint8 0/255 mask_miss at source resolution.
    Returns (images (N, S, S, 3) uint8, mask (N, S, S) float [0,1],
    anns (N, P, J, 4)) — the same contract the host pipeline ships, so the
    GT encoder and train step are unchanged downstream.
    """
    from ..data.transforms import PAD_RGB

    # ONE 4-channel warp for RGB + mask_miss: the two warps share every
    # coordinate/weight/gather (the gather cost is per-position, not
    # per-channel — packing halved the measured warp time, BENCHMARKS.md
    # round 4); border is PAD_RGB for the image channels, 255 for the mask
    packed = jnp.concatenate(
        [raw_images, raw_masks[..., None].astype(raw_images.dtype)], axis=-1)
    border = jnp.asarray(tuple(PAD_RGB) + (255.0,), jnp.float32)
    if warp_impl == 'tiled':
        warped = affine_sample_tiled(packed, mats_inv, (out_size, out_size),
                                     border, valid_hw,
                                     slope_bound=slope_bound)
    else:
        warped = affine_sample(packed, mats_inv, (out_size, out_size), border,
                               valid_hw)
    imgs = photometric(warped[..., :3], grays, tints)
    # cv2 saturates + rounds to uint8 at every stage; one final quantization
    imgs = jnp.clip(jnp.round(imgs), 0, 255).astype(jnp.uint8)
    mask = jnp.clip(warped[..., 3] / 255.0, 0.0, 1.0)

    anns = transform_annotations(anns, mats, scale_xy, flips,
                                 left_index, right_index, out_size)
    return imgs, mask, anns


def augment_batch_dict(batch, out_size: int, left_index: Sequence[int],
                       right_index: Sequence[int],
                       warp_impl: str = 'tiled', slope_bound: float = 3.0):
    """`augment_batch` over the batch dict the data pipeline ships
    (sample_spec keys) — the one unpacking shared by every jitted caller."""
    return augment_batch(
        batch['image'], batch['mask_miss'], batch['anns'],
        batch['aug_mat'], batch['aug_mat_inv'], batch['aug_scale_xy'],
        batch['aug_flags'][:, 0] > 0.5, batch['aug_flags'][:, 1] > 0.5,
        batch['aug_tint'], batch['valid_hw'], out_size,
        left_index, right_index,
        warp_impl=warp_impl, slope_bound=slope_bound)
