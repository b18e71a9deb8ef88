"""On-device keypoint detection + guiding-offset limb collection.

TPU-native redesign of the reference's GPU decode stage (decoder/heatmap.py,
decoder/collect.py, decoder/offset.py): everything here is batched, fixed-shape
and jittable -- peak NMS is a reduce_window, per-channel top-k is
`jax.lax.top_k`, limb pairing is a dense (L, K, K) masked min -- so the whole
pipeline fuses into one XLA program with no host round-trip.

Array layout: feature maps are NHWC (`(N, H, W, C)`), TPU's preferred layout.
Candidate tensors are kept as a structured `Limbs` pytree instead of the
reference's packed `(N, L, K, 13)` float matrix (decoder/collect.py:220-233);
`pack_limbs` produces that layout for interop and testing.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import DecoderConfig


class Limbs(NamedTuple):
    """All candidate limbs of a batch; every leaf is (N, L, K) or (N, L, K, 2).

    Field meanings mirror the columns of the reference's limbs tensor
    (decoder/collect.py:220-233).
    """
    xy_f: jax.Array        # (N, L, K, 2) start-keypoint coordinates
    score_f: jax.Array     # (N, L, K) start-keypoint heatmap response
    xy_t: jax.Array        # (N, L, K, 2) matched end-keypoint coordinates
    score_t: jax.Array     # (N, L, K)
    ind_f: jax.Array       # (N, L, K) int32 global keypoint index (channel*H*W + flat)
    ind_t: jax.Array       # (N, L, K) int32
    min_dist: jax.Array    # (N, L, K) guiding-offset endpoint error ("len_delta")
    len_limb: jax.Array    # (N, L, K) clamped limb length
    limb_score: jax.Array  # (N, L, K) v_f * v_t * exp(-min_dist/len_limb)
    scale_f: jax.Array     # (N, L, K) keypoint scale at start joint
    scale_t: jax.Array     # (N, L, K)


def hmp_nms(heat: jax.Array, kernel: int = 3) -> jax.Array:
    """3x3 max-pool peak NMS: non-peak responses are zeroed.

    Equivalent to decoder/heatmap.py:15-35. `heat` is (N, H, W, C).
    Zero-padding (not -inf) matches the reference's F.pad default, which
    can suppress negative border "peaks" -- intended behavior for heatmaps.
    """
    pad = (kernel - 1) // 2
    # zero-pad first (the reference F.pads with zeros, which can suppress
    # negative border peaks -- intended for heatmaps), then a VALID max window
    padded = jnp.pad(heat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hmax = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding='VALID')
    return jnp.where(hmax == heat, heat, 0.0)


def topk_channel(scores: jax.Array, k: int):
    """Top-K responses per heatmap channel (decoder/heatmap.py:38-49).

    Args:
        scores: (N, H, W, C)
    Returns:
        (scores, flat_inds, ys, xs), each (N, C, K); inds index into H*W
        row-major, ys/xs are int32 pixel coordinates.
    """
    n, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(n, c, h * w)
    topk_scores, topk_inds = jax.lax.top_k(flat, k)
    topk_inds = topk_inds.astype(jnp.int32)
    return topk_scores, topk_inds, topk_inds // w, topk_inds % w


def joint_dets(hmps: jax.Array, k: int, nms_kernel: int = 3):
    """NMS + top-k composition (decoder/heatmap.py:52-59)."""
    return topk_channel(hmp_nms(hmps, nms_kernel), k)


def topk_channel_blockreduce(scores: jax.Array, k: int, block: int = 2,
                             use_pallas: bool = False,
                             pallas_interpret: bool = False):
    """Exact top-k over NMS output via a block-max pre-reduction.

    After 3x3 peak NMS no two surviving peaks can occupy the same 2x2 block
    (they would be adjacent and one would have suppressed the other, except
    for exact-value ties), so reducing each block to its max before
    `lax.top_k` is value-exact while cutting the sort size by block^2 --
    the full-resolution top-k dominates decode cost otherwise.

    Tie bound (tested in tests/test_decoder.py::test_blockreduce_*): two
    EQUAL adjacent peaks both survive NMS; if they share one 2x2 block they
    collapse to a single candidate here (plain `topk_channel` would return
    the value twice, one pixel apart) and the freed slot takes the next
    true peak. Equal peaks in different blocks are exact. The collapsed
    duplicate is a redundant 1px-apart detection of the same joint, so
    grouping output is unaffected in practice.

    Returns the same (scores, flat_inds, ys, xs) as `topk_channel`.
    """
    assert block == 2, 'exactness argument only holds for 2x2 blocks'
    n, h, w, c = scores.shape
    hb, wb = h // block, w // block
    # block maxima in one reduce_window pass (no layout shuffle of the full
    # map), then resolve the within-block argmax only at the K chosen blocks
    # via tiny gathers
    bvals = jax.lax.reduce_window(
        scores, -jnp.inf, jax.lax.max,
        window_dimensions=(1, block, block, 1),
        window_strides=(1, block, block, 1), padding='VALID')
    if use_pallas:
        # iterative extraction kernel: NMS output is sparse, k rounds of
        # (max, argmin-index, mask) beat any sort (ops/pallas/topk_pallas.py)
        from .pallas.topk_pallas import topk_pallas
        bt = bvals.transpose(0, 3, 1, 2).reshape(n * c, hb, wb)
        topv, topb = topk_pallas(bt, k, interpret=pallas_interpret)
        topv = topv.reshape(n, c, k)
        topb = topb.reshape(n, c, k)
    else:
        bflat = bvals.transpose(0, 3, 1, 2).reshape(n, c, hb * wb)
        topv, topb = _topk_segmented(bflat, k)
    topb = topb.astype(jnp.int32)
    by, bx = topb // wb, topb % wb                       # (N, C, K)
    ys0, xs0 = by * block, bx * block

    flat = scores.reshape(n, h * w, c)
    def gather_at(yy, xx):
        idx = (yy * w + xx).transpose(0, 2, 1)           # (N, K, C)
        return jnp.take_along_axis(flat, idx, axis=1).transpose(0, 2, 1)

    cands = jnp.stack([gather_at(ys0, xs0), gather_at(ys0, xs0 + 1),
                       gather_at(ys0 + 1, xs0), gather_at(ys0 + 1, xs0 + 1)])
    local = jnp.argmax(cands, axis=0).astype(jnp.int32)  # first-wins row-major
    ys = ys0 + local // block
    xs = xs0 + local % block
    return topv, ys * w + xs, ys, xs


def _topk_segmented(vals: jax.Array, k: int, target_segment: int = 2048):
    """Exact top-k over the last axis via two-stage segmented selection.

    A single `lax.top_k` over M elements is a full sort on TPU; splitting into
    S segments, taking top-k per segment and re-selecting over the S*k
    candidates is exact (any global top-k element is a top-k element of its
    segment) and much cheaper for large M.
    """
    *lead, m = vals.shape
    if m <= 2 * target_segment or k * 8 >= m:
        return jax.lax.top_k(vals, k)
    segs = max(2, m // target_segment)
    while m % segs:
        segs -= 1
    seg_len = m // segs
    if seg_len <= k:
        return jax.lax.top_k(vals, k)
    v = vals.reshape(*lead, segs, seg_len)
    sv, si = jax.lax.top_k(v, k)                      # (..., segs, k)
    base = (jnp.arange(segs, dtype=jnp.int32) * seg_len)[:, None]
    cidx = (si.astype(jnp.int32) + base).reshape(*lead, segs * k)
    cand = sv.reshape(*lead, segs * k)
    fv, fi = jax.lax.top_k(cand, k)
    inds = jnp.take_along_axis(cidx, fi, axis=-1)
    return fv, inds


def sample_limb_maps(maps: jax.Array, channels, xs: jax.Array, ys: jax.Array,
                     stride: int, method: str = 'bilinear',
                     impl: str = 'dense') -> jax.Array:
    """Sample per-limb channel pairs/singles of a stride-`stride` map at
    full-resolution integer pixel positions, reproducing
    `upsample2d(maps, stride, method)` gathered at those pixels -- without
    materializing the upsampled map.

    Args:
        maps: (N, h, w, C) stride-resolution map.
        channels: None (use all C channels), (L,) channel index per limb, or
            (L, V) channel group per limb -- output then has maps' trailing
            group selected per limb.
        xs, ys: (N, L, K) int32 full-resolution pixel coordinates (may be
            out of range; clamped like the torch resize border handling).
        method: 'bilinear' (2 taps/axis) or 'bicubic' (4 taps, A=-0.75).
        impl: 'dense' (default) -- per-axis interpolation-weight matrices
            contracted on the MXU; 'gather' -- ALL tap reads fused into one
            take_along_axis with precomputed flat (y, x, channel) indices.
            Identical results (both poison a sample with +inf whenever any
            tap cell in the interpolation footprint is non-finite, even at
            zero weight: the reference upsample would have spread the
            sentinel). Measured e2e at the benchmark config on v5e:
            dense ~197 img/s vs gather ~183 -- TPU gathers serialize while
            the dense contraction rides the MXU, so the L*K*T^2-element
            gather LOSES to the dense form despite its (N, L, h, w)
            broadcast traffic. 'gather' is kept as the semantic
            cross-check (tests/test_decoder_sampled.py) and for
            gather-friendly backends.
    Returns:
        (N, L, K, C_sel) sampled values, C_sel = C if channels is None else
        the per-limb selected channel (C_sel=1) -- for vector maps pass a
        reshaped (N, h, w, L, V) and channels=None-per-limb handled by caller.
    """
    n, h, w = maps.shape[:3]
    L, k = xs.shape[1], xs.shape[2]
    # source cell coordinates (half-pixel alignment)
    cx = (xs.astype(jnp.float32) + 0.5) / stride - 0.5
    cy = (ys.astype(jnp.float32) + 0.5) / stride - 0.5

    if method == 'bilinear':
        rel = np.arange(0, 2)
    elif method == 'bicubic':
        rel = np.arange(-1, 3)
    else:
        raise ValueError(method)

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0

    def weights(f):
        if method == 'bilinear':
            return jnp.stack([1.0 - f, f], axis=-1)        # (..., 2)
        from .resize import _cubic_kernel
        d = rel[None, :] - f[..., None]                    # (..., 4)
        a = -0.75
        ad = jnp.abs(d)
        wv = jnp.where(
            ad <= 1.0, (a + 2) * ad ** 3 - (a + 3) * ad ** 2 + 1.0,
            jnp.where(ad < 2.0,
                      a * ad ** 3 - 5 * a * ad ** 2 + 8 * a * ad - 4 * a, 0.0))
        return wv

    wx = weights(fx)                                       # (N, L, K, T)
    wy = weights(fy)

    if impl == 'gather':
        assert channels is None or np.asarray(channels).ndim == 1, \
            'gather impl keeps the original per-limb single-channel form'
        T = len(rel)
        C = maps.shape[-1]
        # clipped tap coordinates (border clamp, duplicate taps accumulate)
        xi = jnp.clip(x0.astype(jnp.int32)[..., None] + np.asarray(rel),
                      0, w - 1)                            # (N, L, K, T)
        yi = jnp.clip(y0.astype(jnp.int32)[..., None] + np.asarray(rel),
                      0, h - 1)
        # flat (y, x) index per tap pair, then channel page
        pix = (yi[..., :, None] * w + xi[..., None, :])    # (N, L, K, T, T)
        if channels is not None:
            ch = jnp.asarray(channels, dtype=jnp.int32)    # (L,)
            idx = pix * C + ch[None, :, None, None, None]
            idx = idx.reshape(n, L * k * T * T)
            taps = jnp.take_along_axis(maps.reshape(n, h * w * C),
                                       idx, axis=1)
            taps = taps.reshape(n, L, k, T, T)
            wgt = wy[..., :, None] * wx[..., None, :]      # (N, L, K, T, T)
            val = jnp.sum(wgt * jnp.where(jnp.isfinite(taps), taps, 0.0),
                          axis=(-2, -1))[..., None]
            touched = jnp.any(~jnp.isfinite(taps), axis=(-2, -1))[..., None]
            return jnp.where(touched, jnp.inf, val)
        idx = (pix[..., None] * C
               + jnp.arange(C, dtype=jnp.int32))           # (N,L,K,T,T,C)
        taps = jnp.take_along_axis(maps.reshape(n, h * w * C),
                                   idx.reshape(n, L * k * T * T * C), axis=1)
        taps = taps.reshape(n, L, k, T, T, C)
        wgt = (wy[..., :, None] * wx[..., None, :])[..., None]
        val = jnp.sum(wgt * jnp.where(jnp.isfinite(taps), taps, 0.0),
                      axis=(-3, -2))
        touched = jnp.any(~jnp.isfinite(taps), axis=(-3, -2))
        return jnp.where(touched, jnp.inf, val)

    # Dense per-axis interpolation-weight matrices: one elementwise compare
    # per tap (duplicate clipped border taps accumulate, exactly like the
    # old per-tap gather loop), then the sampling contracts on the MXU.
    # The previous formulation issued T^2 take_along_axis fusions (16 for
    # bicubic) of ~50-100 us each on v5e -- ~2 ms of latency-bound gathers
    # per 640^2 batch-8 decode; the two einsums below replace all of them.
    def dense_w(base, frac_w, size):
        iota = jnp.arange(size, dtype=jnp.int32)
        acc = None
        hit = None
        for ti, r in enumerate(rel):
            oh = (iota == jnp.clip(base.astype(jnp.int32) + int(r),
                                   0, size - 1)[..., None])
            term = frac_w[..., ti, None] * oh
            acc = term if acc is None else acc + term
            hit = oh if hit is None else hit | oh
        return acc, hit.astype(frac_w.dtype)               # (N, L, K, size)

    Wy, Hy = dense_w(y0, wy, h)
    Wx, Hx = dense_w(x0, wx, w)

    # Non-finite sentinel semantics: the old per-tap gather poisoned a sample
    # whenever ANY tap cell was +-inf/NaN (even at an exactly-zero bicubic
    # weight: 0 * inf = NaN). The dense contraction would instead poison
    # EVERY sample in the row (matmul touches all cells), so the maps are
    # sanitized for the value contraction and the poisoning is re-applied
    # from a 0/1 tap-footprint contraction over the non-finite mask.
    # Operand diet matters more than dispatch count here: stacking the val
    # and mask operands into one batched einsum was measured SLOWER (the
    # stack materializes 124 MB for the off map); per-limb channel takes
    # that select every channel in order are skipped entirely (free views).
    finite = jnp.isfinite(maps)
    maps_c = jnp.where(finite, maps, 0.0)
    nf = (~finite).astype(Wy.dtype)

    if channels is not None:
        ch = np.asarray(channels, dtype=np.int32)
        V = 1 if ch.ndim == 1 else ch.shape[1]
        C_all = maps.shape[-1]
        if ch.size == C_all and np.array_equal(ch.reshape(-1),
                                               np.arange(C_all)):
            M = maps_c.reshape(n, h, w, L, V)              # identity take
            Mnf = nf.reshape(n, h, w, L, V)
        else:
            chf = jnp.asarray(ch.reshape(-1))
            M = jnp.take(maps_c, chf, axis=-1).reshape(n, h, w, L, V)
            Mnf = jnp.take(nf, chf, axis=-1).reshape(n, h, w, L, V)
        tmp = jnp.einsum('nlkh,nhwlv->nlkwv', Wy, M, precision='highest')
        val = jnp.einsum('nlkwv,nlkw->nlkv', tmp, Wx, precision='highest')
        t1 = jnp.einsum('nlkh,nhwlv->nlkwv', Hy, Mnf, precision='highest')
        hits = jnp.einsum('nlkwv,nlkw->nlkv', t1, Hx, precision='highest')
        return jnp.where(hits > 0, jnp.inf, val)           # (N, L, K, V)

    C_sel = maps.shape[-1]
    Wy2 = Wy.reshape(n, L * k, h)
    Wx2 = Wx.reshape(n, L * k, w)
    tmp = jnp.einsum('nph,nhwc->npwc', Wy2, maps_c, precision='highest')
    val = jnp.einsum('npw,npwc->npc', Wx2, tmp, precision='highest')
    t1 = jnp.einsum('nph,nhwc->npwc', Hy.reshape(n, L * k, h), nf,
                    precision='highest')
    touched = jnp.einsum('npw,npwc->npc', Hx.reshape(n, L * k, w), t1,
                         precision='highest') > 0
    out = jnp.where(touched, jnp.inf, val)
    return out.reshape(n, L, k, C_sel)


def scored_offset(hmp: jax.Array, off: jax.Array, jtypes_f: np.ndarray,
                  kernel_size: int = 3) -> jax.Array:
    """Heatmap-score-weighted local average of guiding offsets.

    Optional refinement (decoder/offset.py:8-43): offsets are averaged over a
    k x k window with the start-joint heatmap response as weights.

    Args:
        hmp: (N, H, W, C) heatmaps.
        off: (N, H, W, V*L) guiding offsets (V=2, or 4 after a
            `cat_flip_offs` flip merge -- each component weighted alike).
        jtypes_f: (L,) start-joint channel per limb.
    """
    n, h, w, c2 = off.shape
    L = len(jtypes_f)
    score = jnp.take(hmp, jnp.asarray(jtypes_f), axis=-1)         # (N, H, W, L)
    somap = off.reshape(n, h, w, L, c2 // L) * score[..., None]    # (N,H,W,L,V)

    def box_sum(x):
        pad = (kernel_size - 1) // 2
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, kernel_size, kernel_size) + (1,) * (x.ndim - 3),
            window_strides=(1,) * x.ndim,
            padding=((0, 0), (pad, pad), (pad, pad)) + ((0, 0),) * (x.ndim - 3))

    mean_score = box_sum(score)                                    # (N, H, W, L)
    weighted = box_sum(somap) / (mean_score[..., None] + 1e-6)
    return weighted.reshape(n, h, w, c2)


def collect_limbs(
    hmps: jax.Array,
    offs: jax.Array,
    jtypes_f: np.ndarray,
    jtypes_t: np.ndarray,
    cfg: DecoderConfig,
    jomps: Optional[jax.Array] = None,
    scmps: Optional[jax.Array] = None,
    resize_factor: float = 1.0,
    pallas_interpret: bool = False,
) -> Limbs:
    """Pair candidate keypoints into limbs guided by offset vectors.

    Vectorized equivalent of decoder/collect.py:62-236. All inputs share the
    same spatial resolution (the reference upsamples to input resolution first;
    `resize_factor` rescales offset units if hmp/off strides differ).

    Args:
        hmps:  (N, H, W, C) keypoint heatmaps.
        offs:  (N, H, W, 2L) guiding offsets in input-resolution units,
               channel layout [x0, y0, x1, y1, ...].
        jomps: (N, H, W, 2) jitter offsets to the nearest keypoint, or None.
        scmps: (N, H, W, C) keypoint scale map, or None.
    """
    n, h, w, c = hmps.shape
    L = len(jtypes_f)
    k = cfg.topk
    jf = jnp.asarray(jtypes_f, dtype=jnp.int32)
    jt = jnp.asarray(jtypes_t, dtype=jnp.int32)

    use_pallas = (cfg.pallas_grouping == 'on'
                  or (cfg.pallas_grouping == 'auto'
                      and jax.default_backend() == 'tpu'))
    if (use_pallas or pallas_interpret) and cfg.nms_kernel == 3:
        # fused NMS + iterative top-k, one VMEM pass per channel map; exact
        # vs lax.top_k(hmp_nms(x)) incl. tie order (lowest index first).
        # `lax.top_k` is a full O(HW log HW) sort per channel on TPU -- the
        # dominant decode cost of the stride-resolution path before this.
        from .pallas.nms_topk_pallas import nms_topk_pallas
        bt = hmps.transpose(0, 3, 1, 2).reshape(n * c, h, w)
        vals, flat = nms_topk_pallas(bt, k, interpret=pallas_interpret)
        scores = vals.reshape(n, c, k)
        inds = flat.reshape(n, c, k)
        ys, xs = inds // w, inds % w
    else:
        scores, inds, ys, xs = joint_dets(hmps, k, cfg.nms_kernel)  # (N,C,K)

    def channel_dets(jtypes):
        # (N, C, K) -> (N, L, K); low-response candidates pushed off-image
        # (decoder/collect.py:246-254)
        s = jnp.take(scores, jtypes, axis=1)
        i = jnp.take(inds, jtypes, axis=1)
        xy = jnp.stack([jnp.take(xs, jtypes, axis=1),
                        jnp.take(ys, jtypes, axis=1)], axis=-1).astype(jnp.float32)
        xy = jnp.where(s[..., None] < cfg.thre_hmp, xy - 100000.0, xy)
        return i, s, xy

    inds_f, scores_f, xys_f = channel_dets(jf)
    inds_t, scores_t, xys_t = channel_dets(jt)

    def gather_channel_map(cmap, jtypes, gather_inds):
        # cmap (N, H, W, C) -> per-limb flat (N, L, H*W) -> gather (N, L, K)
        flat = cmap.transpose(0, 3, 1, 2).reshape(n, c, h * w)
        flat = jnp.take(flat, jtypes, axis=1)
        return jnp.take_along_axis(flat, gather_inds, axis=-1)

    if scmps is not None:
        scales_f = gather_channel_map(scmps, jf, inds_f)
        scales_t = gather_channel_map(scmps, jt, inds_t)
    else:
        scales_f = jnp.full_like(scores_f, cfg.default_scale)
        scales_t = jnp.full_like(scores_t, cfg.default_scale)

    def gather_vec2(vmap2, gather_inds):
        # vmap2 (N, H, W, 2) gathered at (N, L, K) flat inds -> (N, L, K, 2);
        # flattened L*K gather (no L-fold broadcast of the map)
        flat = vmap2.reshape(n, h * w, 2)
        idx = gather_inds.reshape(n, L * k, 1)
        v = jnp.take_along_axis(
            flat, jnp.broadcast_to(idx, (n, L * k, 2)), axis=1)
        return v.reshape(n, L, k, 2)

    if jomps is not None:
        jitter_f = gather_vec2(jomps, inds_f)
        jitter_t = gather_vec2(jomps, inds_t)
    else:
        jitter_f = jnp.zeros((n, L, k, 2), dtype=xys_f.dtype)
        jitter_t = jnp.zeros((n, L, k, 2), dtype=xys_t.dtype)

    # gather guiding-offset vectors at start-keypoint positions. Flattened
    # single gather: the former (N, H*W, L, 2) -> (N, L, H*W, 2) transpose
    # materialized a 15.6MB strided copy per map only to read L*K vectors
    # from it. V=2 normally; V=4 after a `cat_flip_offs` flip merge
    # (reference collect.py:143-152 vector_nd).
    V = offs.shape[-1] // L
    off_flat = offs.reshape(n, h * w * L * V)
    base = inds_f * jnp.int32(L * V) \
        + (jnp.arange(L, dtype=jnp.int32) * V)[None, :, None]   # (N, L, K)
    idx2 = jnp.stack([base + j for j in range(V)],
                     axis=-1).reshape(n, L * k * V)
    off_f = jnp.take_along_axis(off_flat, idx2, axis=1).reshape(n, L, k, V)

    # regressed end-joint positions (decoder/collect.py:152); with V=4 the
    # start point repeats across both vector halves (kps_xys_f.repeat)
    guid_t = jnp.tile(xys_f, (1, 1, 1, V // 2)) + off_f * resize_factor

    # dense pairing: (N, L, K, M) distance, min over end candidates M; for
    # V=4 the target also repeats, so the metric is |[g1;g2] - [t;t]|
    # (reference collect.py:171-177). Work in SQUARED distance -- min and
    # sqrt commute exactly (sqrt is monotone and correctly rounded), so only
    # the K minima need the sqrt, not the K*M matrix
    diff = (guid_t[:, :, :, None, :]
            - jnp.tile(xys_t, (1, 1, 1, V // 2))[:, :, None, :, :])
    dist2 = jnp.sum(diff * diff, axis=-1)
    min_dist = jnp.sqrt(jnp.min(dist2, axis=-1))
    min_ind = jnp.argmin(dist2, axis=-1).astype(jnp.int32)

    take = lambda v: jnp.take_along_axis(v, min_ind, axis=-1)
    matched_score_t = take(scores_t)
    matched_ind_t = take(inds_t)
    matched_scale_t = take(scales_t)
    matched_xys_t = jnp.take_along_axis(xys_t, min_ind[..., None], axis=2)
    matched_jitter_t = jnp.take_along_axis(jitter_t, min_ind[..., None], axis=2)

    # global keypoint indices across channels (decoder/collect.py:194-199)
    page = jnp.int32(h * w)
    gind_f = inds_f + jf[None, :, None] * page
    gind_t = matched_ind_t + jt[None, :, None] * page

    len_limb = jnp.maximum(
        jnp.linalg.norm(xys_f - matched_xys_t, axis=-1), cfg.min_len)
    limb_score = scores_f * matched_score_t * jnp.exp(-min_dist / len_limb)

    # jitter refinement of final coordinates (decoder/collect.py:216-218)
    if cfg.use_jitter_offset and jomps is not None:
        xys_f = xys_f + jitter_f
        matched_xys_t = matched_xys_t + matched_jitter_t

    return Limbs(
        xy_f=xys_f, score_f=scores_f,
        xy_t=matched_xys_t, score_t=matched_score_t,
        ind_f=gind_f, ind_t=gind_t,
        min_dist=min_dist, len_limb=len_limb, limb_score=limb_score,
        scale_f=scales_f, scale_t=matched_scale_t)


def collect_limbs_peak_sampled(
    hmp_up: jax.Array,
    offs4: jax.Array,
    jtypes_f: np.ndarray,
    jtypes_t: np.ndarray,
    cfg: DecoderConfig,
    jomps4: Optional[jax.Array] = None,
    scmps4: Optional[jax.Array] = None,
    stride: int = 4,
) -> Limbs:
    """Reference-parity limb collection without materializing upsampled
    offset/jitter/scale maps.

    Peaks come from the bicubic-upsampled heatmaps (`hmp_up`, full input
    resolution) via NMS + block-reduced exact top-k; the auxiliary maps stay
    at stride resolution and are interpolated only at the K selected peaks,
    reproducing `upsample2d(map) gathered at peak` bit-for-bit (bilinear for
    offsets/jitter per decoder/factory.py:77-88, `cfg.resize_mode` for
    scales).
    """
    n, h, w, c = hmp_up.shape
    # barrier: stop XLA from fusing the (expensive, 16-phase bicubic)
    # upsample producer into the NMS reduce_window consumer, which would
    # recompute the interpolation once per window tap
    hmp_up = jax.lax.optimization_barrier(hmp_up)
    nmsed = jax.lax.optimization_barrier(hmp_nms(hmp_up, cfg.nms_kernel))
    use_pallas_topk = (cfg.pallas_grouping == 'on'
                       or (cfg.pallas_grouping == 'auto'
                           and jax.default_backend() == 'tpu'))
    scores, inds, ys, xs = topk_channel_blockreduce(
        nmsed, cfg.topk, use_pallas=use_pallas_topk)
    return _collect_from_peaks(scores, inds, ys, xs, h, w, offs4,
                               jtypes_f, jtypes_t, cfg, jomps4, scmps4,
                               stride)


def collect_limbs_peak_fused(
    hmps: jax.Array,
    offs4: jax.Array,
    jtypes_f: np.ndarray,
    jtypes_t: np.ndarray,
    cfg: DecoderConfig,
    jomps4: Optional[jax.Array] = None,
    scmps4: Optional[jax.Array] = None,
    stride: int = 4,
    interpret: bool = False,
) -> Limbs:
    """`collect_limbs_peak_sampled` with peak finding in ONE Pallas kernel:
    bicubic upsample + NMS + block-max + iterative top-k all stay in VMEM
    (ops/pallas/peaks_pallas.py); the (N, 4h, 4w, C) map never exists.

    `hmps` are STRIDE-resolution heatmaps (N, h, w, C).
    """
    from .pallas.peaks_pallas import fused_peaks_topk_pallas

    n, h, w, c = hmps.shape
    H, W = h * stride, w * stride
    k = cfg.topk
    bt = hmps.transpose(0, 3, 1, 2).reshape(n * c, h, w)
    vals, pys, pxs = fused_peaks_topk_pallas(
        bt, k, factor=stride, method=cfg.resize_mode, interpret=interpret,
        maps_per_step=cfg.peaks_map_batch)
    scores = vals.reshape(n, c, k)
    ys = pys.reshape(n, c, k)
    xs = pxs.reshape(n, c, k)
    inds = ys * W + xs
    return _collect_from_peaks(scores, inds, ys, xs, H, W, offs4,
                               jtypes_f, jtypes_t, cfg, jomps4, scmps4,
                               stride)


def _collect_from_peaks(scores, inds, ys, xs, h, w, offs4, jtypes_f,
                        jtypes_t, cfg: DecoderConfig, jomps4, scmps4,
                        stride: int) -> Limbs:
    """Limb pairing from per-channel peak sets (scores/inds/ys/xs all
    (N, C, K) at full input resolution h x w)."""
    n = scores.shape[0]
    L = len(jtypes_f)
    k = cfg.topk
    jf = jnp.asarray(jtypes_f, dtype=jnp.int32)
    jt = jnp.asarray(jtypes_t, dtype=jnp.int32)

    def channel_dets(jtypes):
        s = jnp.take(scores, jtypes, axis=1)
        i = jnp.take(inds, jtypes, axis=1)
        x = jnp.take(xs, jtypes, axis=1)
        y = jnp.take(ys, jtypes, axis=1)
        xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
        xy = jnp.where(s[..., None] < cfg.thre_hmp, xy - 100000.0, xy)
        return i, s, x, y, xy

    inds_f, scores_f, xs_f, ys_f, xys_f = channel_dets(jf)
    inds_t, scores_t, xs_t, ys_t, xys_t = channel_dets(jt)

    # guiding offsets at from-peaks: per-limb (L, V) channel group of offs4
    # in ONE sampling contraction. V=2 normally; V=4 after a `cat_flip_offs`
    # flip merge (reference collect.py:143-152 vector_nd).
    V = offs4.shape[-1] // L
    ch_pairs = (V * np.arange(L, dtype=np.int32))[:, None] \
        + np.arange(V, dtype=np.int32)[None, :]               # (L, V)
    off_f = sample_limb_maps(offs4, ch_pairs, xs_f, ys_f, stride, 'bilinear')

    # scale/jitter dedup: every limb endpoint samples its keypoint channel
    # at that channel's OWN peaks, so sample once per channel (C sets) and
    # take per limb endpoint -- instead of 2x per limb (2L sets). Values are
    # identical; the glue is dispatch-bound so fewer/bigger ops win.
    C = scores.shape[1]
    if scmps4 is not None:
        scale_all = sample_limb_maps(
            scmps4, np.arange(C, dtype=np.int32), xs, ys, stride,
            cfg.resize_mode)[..., 0]                          # (N, C, K)
        scales_f = jnp.take(scale_all, jf, axis=1)
        scales_t = jnp.take(scale_all, jt, axis=1)
    else:
        scales_f = jnp.full_like(scores_f, cfg.default_scale)
        scales_t = jnp.full_like(scores_t, cfg.default_scale)

    if jomps4 is not None:
        jit_all = sample_limb_maps(jomps4, None, xs, ys, stride,
                                   'bilinear')                # (N, C, K, 2)
        jitter_f = jnp.take(jit_all, jf, axis=1)
        jitter_t = jnp.take(jit_all, jt, axis=1)
    else:
        jitter_f = jnp.zeros((n, L, k, 2), dtype=xys_f.dtype)
        jitter_t = jnp.zeros((n, L, k, 2), dtype=xys_t.dtype)

    guid_t = jnp.tile(xys_f, (1, 1, 1, V // 2)) + off_f       # (N, L, K, V)

    if cfg.guid_jitter_refine and jomps4 is not None:
        # refine each regressed endpoint with the jitter offset sampled at
        # its truncated-integer position, skipped when off-image (reference
        # collect.py:158-165; that loop indexes jomps with transposed
        # coordinates -- intended [y, x] indexing is used here, see
        # DecoderConfig.guid_jitter_refine).
        pairs = []
        for j in range(V // 2):
            g = guid_t[..., 2 * j:2 * j + 2]
            gx = g[..., 0].astype(jnp.int32)      # trunc toward 0 == .int()
            gy = g[..., 1].astype(jnp.int32)
            ok = (gx >= 0) & (gx < w) & (gy >= 0) & (gy < h) \
                & jnp.isfinite(g).all(axis=-1)
            jit = sample_limb_maps(jomps4, None,
                                   jnp.clip(gx, 0, w - 1),
                                   jnp.clip(gy, 0, h - 1),
                                   stride, 'bilinear')        # (N, L, K, 2)
            pairs.append(jnp.where(ok[..., None], g + jit, g))
        guid_t = jnp.concatenate(pairs, axis=-1)

    # V=4: the pairing metric is |[g1;g2] - [t;t]| (collect.py:171-177).
    # Squared distance: min/argmin commute with the (monotone, correctly
    # rounded) sqrt, so only the K minima are rooted, not the K*M matrix
    diff = (guid_t[:, :, :, None, :]
            - jnp.tile(xys_t, (1, 1, 1, V // 2))[:, :, None, :, :])
    dist2 = jnp.sum(diff * diff, axis=-1)
    min_dist = jnp.sqrt(jnp.min(dist2, axis=-1))
    min_ind = jnp.argmin(dist2, axis=-1).astype(jnp.int32)

    take = lambda v: jnp.take_along_axis(v, min_ind, axis=-1)
    matched_score_t = take(scores_t)
    matched_ind_t = take(inds_t)
    matched_scale_t = take(scales_t)
    matched_xys_t = jnp.take_along_axis(xys_t, min_ind[..., None], axis=2)
    matched_jitter_t = jnp.take_along_axis(jitter_t, min_ind[..., None],
                                           axis=2)

    page = jnp.int32(h * w)
    gind_f = inds_f + jf[None, :, None] * page
    gind_t = matched_ind_t + jt[None, :, None] * page

    len_limb = jnp.maximum(
        jnp.linalg.norm(xys_f - matched_xys_t, axis=-1), cfg.min_len)
    limb_score = scores_f * matched_score_t * jnp.exp(-min_dist / len_limb)

    if cfg.use_jitter_offset and jomps4 is not None:
        xys_f = xys_f + jitter_f
        matched_xys_t = matched_xys_t + matched_jitter_t

    return Limbs(
        xy_f=xys_f, score_f=scores_f,
        xy_t=matched_xys_t, score_t=matched_score_t,
        ind_f=gind_f, ind_t=gind_t,
        min_dist=min_dist, len_limb=len_limb, limb_score=limb_score,
        scale_f=scales_f, scale_t=matched_scale_t)


def pack_limbs(limbs: Limbs) -> jax.Array:
    """Pack to the reference's (N, L, K, 13) column layout
    [x1,y1,v1,x2,y2,v2,ind1,ind2,len_delta,len_limb,limb_score,scale1,scale2]
    (decoder/collect.py:220-233)."""
    cols = [
        limbs.xy_f[..., 0], limbs.xy_f[..., 1], limbs.score_f,
        limbs.xy_t[..., 0], limbs.xy_t[..., 1], limbs.score_t,
        limbs.ind_f.astype(jnp.float32), limbs.ind_t.astype(jnp.float32),
        limbs.min_dist, limbs.len_limb, limbs.limb_score,
        limbs.scale_f, limbs.scale_t,
    ]
    return jnp.stack(cols, axis=-1)


def unpack_limbs(packed) -> Limbs:
    """Inverse of `pack_limbs` (accepts numpy or jax arrays)."""
    p = jnp.asarray(packed)
    return Limbs(
        xy_f=p[..., 0:2], score_f=p[..., 2],
        xy_t=p[..., 3:5], score_t=p[..., 5],
        ind_f=p[..., 6].astype(jnp.int32), ind_t=p[..., 7].astype(jnp.int32),
        min_dist=p[..., 8], len_limb=p[..., 9], limb_score=p[..., 10],
        scale_f=p[..., 11], scale_t=p[..., 12])
