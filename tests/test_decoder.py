"""Decoder op parity vs an independent torch/numpy oracle.

The oracle below re-derives the reference decode semantics
(decoder/heatmap.py, decoder/collect.py) with torch CPU ops for testing only.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from offsetguided_tpu.config import COCO_PERSON_SKELETON, skeleton_from_arrays
from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.ops import decoder as dec


def torch_nms(heat_nchw, kernel=3):
    pad = (kernel - 1) // 2
    padded = F.pad(heat_nchw, (pad, pad, pad, pad))
    hmax = F.max_pool2d(padded, (kernel, kernel), stride=1)
    return heat_nchw * (hmax == heat_nchw).float()


def torch_topk(scores, k):
    n, c, h, w = scores.shape
    s, i = torch.topk(scores.view(n, c, -1), k)
    return s, i, i // w, i % w


def oracle_collect(hmps, offs, jomps, scmps, jf, jt, cfg):
    """Direct loop implementation of limb collection for small inputs."""
    n, h, w, c = hmps.shape
    L, k = len(jf), cfg.topk
    t = torch.from_numpy(hmps.transpose(0, 3, 1, 2).copy())
    s, i, ys, xs = torch_topk(torch_nms(t, cfg.nms_kernel), k)
    s, i, ys, xs = (x.numpy() for x in (s, i, ys, xs))

    out = np.zeros((n, L, k, 13), dtype=np.float64)
    for b in range(n):
        for l in range(L):
            cf, ct = jf[l], jt[l]
            sf, st_ = s[b, cf], s[b, ct]
            xyf = np.stack([xs[b, cf], ys[b, cf]], -1).astype(np.float64)
            xyt = np.stack([xs[b, ct], ys[b, ct]], -1).astype(np.float64)
            xyf[sf < cfg.thre_hmp] -= 100000
            xyt[st_ < cfg.thre_hmp] -= 100000
            offmap = offs[b].reshape(h * w, L, 2)
            guid = xyf + offmap[i[b, cf], l]
            for kk in range(k):
                d = np.linalg.norm(guid[kk][None] - xyt, axis=-1)
                m = int(np.argmin(d))
                len_limb = max(np.linalg.norm(xyf[kk] - xyt[m]), cfg.min_len)
                limb_score = sf[kk] * st_[m] * np.exp(-d[m] / len_limb)
                scale_f = scmps[b].reshape(h * w, c)[i[b, cf, kk], cf] \
                    if scmps is not None else cfg.default_scale
                scale_t = scmps[b].reshape(h * w, c)[i[b, ct, m], ct] \
                    if scmps is not None else cfg.default_scale
                jit_f = jomps[b].reshape(h * w, 2)[i[b, cf, kk]] \
                    if jomps is not None else np.zeros(2)
                jit_t = jomps[b].reshape(h * w, 2)[i[b, ct, m]] \
                    if jomps is not None else np.zeros(2)
                xf = xyf[kk] + (jit_f if cfg.use_jitter_offset else 0)
                xt_ = xyt[m] + (jit_t if cfg.use_jitter_offset else 0)
                out[b, l, kk] = [
                    xf[0], xf[1], sf[kk], xt_[0], xt_[1], st_[m],
                    i[b, cf, kk] + cf * h * w, i[b, ct, m] + ct * h * w,
                    d[m], len_limb, limb_score, scale_f, scale_t]
    return out


def test_nms_matches_torch(rng):
    x = rng.randn(2, 17, 13, 13).astype(np.float32)
    ref = torch_nms(torch.from_numpy(x)).numpy()
    ours = np.asarray(dec.hmp_nms(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_topk_matches_torch(rng):
    x = rng.rand(2, 5, 9, 11).astype(np.float32)
    s_ref, i_ref, y_ref, x_ref = torch_topk(torch.from_numpy(x), 7)
    s, i, y, xx = dec.topk_channel(jnp.asarray(x.transpose(0, 2, 3, 1)), 7)
    np.testing.assert_allclose(np.asarray(s), s_ref.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), i_ref.numpy())
    np.testing.assert_array_equal(np.asarray(y), y_ref.numpy())
    np.testing.assert_array_equal(np.asarray(xx), x_ref.numpy())


@pytest.mark.parametrize('with_aux', [True, False])
def test_collect_limbs_matches_oracle(rng, with_aux):
    n, h, w, c = 2, 16, 14, 17
    jf, jt = skeleton_from_arrays(COCO_PERSON_SKELETON)
    L = len(jf)
    cfg = DecoderConfig(topk=8, thre_hmp=0.1, min_len=0.5, use_jitter_offset=True)
    hmps = rng.rand(n, h, w, c).astype(np.float32)
    offs = (rng.randn(n, h, w, 2 * L) * 3).astype(np.float32)
    jomps = (rng.randn(n, h, w, 2) * 0.5).astype(np.float32) if with_aux else None
    scmps = (rng.rand(n, h, w, c) * 8).astype(np.float32) if with_aux else None

    limbs = dec.collect_limbs(
        jnp.asarray(hmps), jnp.asarray(offs), jf, jt, cfg,
        jomps=None if jomps is None else jnp.asarray(jomps),
        scmps=None if scmps is None else jnp.asarray(scmps))
    packed = np.asarray(dec.pack_limbs(limbs))

    ref = oracle_collect(hmps, offs, jomps, scmps, jf, jt, cfg)
    np.testing.assert_allclose(packed, ref, rtol=1e-4, atol=1e-4)


def test_pack_unpack_roundtrip(rng):
    n, h, w, c = 1, 12, 12, 17
    jf, jt = skeleton_from_arrays(COCO_PERSON_SKELETON)
    cfg = DecoderConfig(topk=4)
    hmps = rng.rand(n, h, w, c).astype(np.float32)
    offs = rng.randn(n, h, w, 38).astype(np.float32)
    limbs = dec.collect_limbs(jnp.asarray(hmps), jnp.asarray(offs), jf, jt, cfg)
    rt = dec.unpack_limbs(np.asarray(dec.pack_limbs(limbs)))
    for a, b in zip(limbs, rt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scored_offset_matches_torch(rng):
    n, h, w, c = 1, 10, 11, 17
    jf, jt = skeleton_from_arrays(COCO_PERSON_SKELETON)
    L = len(jf)
    hmp = rng.rand(n, h, w, c).astype(np.float32)
    off = rng.randn(n, h, w, 2 * L).astype(np.float32)
    ours = np.asarray(dec.scored_offset(jnp.asarray(hmp), jnp.asarray(off), jf, 3))

    # torch oracle per decoder/offset.py:8-43 semantics
    hmp_t = torch.from_numpy(hmp.transpose(0, 3, 1, 2))
    off_t = torch.from_numpy(off.transpose(0, 3, 1, 2))
    score = hmp_t[:, list(jf)].unsqueeze(2)
    somap = score * off_t.view(n, L, 2, h, w)
    mean_score = F.avg_pool2d(score.squeeze(2), 3, 1, 1, divisor_override=1)
    somap_s = F.avg_pool2d(somap.reshape(n, -1, h, w), 3, 1, 1, divisor_override=1)
    ref = (somap_s.view(n, L, 2, h, w) / (mean_score.unsqueeze(2) + 1e-6))
    ref = ref.view(n, 2 * L, h, w).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def _isolated_peak_map(peaks, h=32, w=48, c=1):
    """(value, y, x) peaks painted on a zero background; all peaks must be
    >3px apart unless a tie geometry is wanted."""
    m = np.zeros((1, h, w, c), np.float32)
    for v, y, x in peaks:
        m[0, y, x, 0] = v
    return m


def test_blockreduce_cross_block_ties_exact():
    """Equal-valued peaks in DIFFERENT 2x2 blocks must all survive the
    block-max pre-reduction: values and the position SET match plain
    topk_channel exactly (ordering among equal values may differ)."""
    peaks = [(5.0, 10, 8), (5.0, 10, 20), (5.0, 20, 8),   # exact 3-way tie
             (4.0, 4, 40), (3.0, 26, 30)]
    x = jnp.asarray(_isolated_peak_map(peaks))
    nmsed = dec.hmp_nms(x)
    k = 5
    s1, i1, _, _ = dec.topk_channel(nmsed, k)
    s2, i2, _, _ = dec.topk_channel_blockreduce(nmsed, k)
    np.testing.assert_array_equal(np.sort(np.asarray(s1).ravel()),
                                  np.sort(np.asarray(s2).ravel()))
    assert set(np.asarray(i1).ravel().tolist()) == \
        set(np.asarray(i2).ravel().tolist())


def test_blockreduce_same_block_adjacent_tie_collapses():
    """Documented bound (ops/decoder.py::topk_channel_blockreduce): two
    equal adjacent peaks that BOTH survive 3x3 NMS (exact-value tie) and
    fall in the SAME 2x2 block collapse to one candidate; the freed slot
    takes the next-highest peak. Everything else stays exact."""
    # (10,10) and (10,11) are adjacent, equal, and share block (5, 5)
    peaks = [(5.0, 10, 10), (5.0, 10, 11), (4.0, 4, 40), (3.0, 26, 30),
             (2.0, 20, 4)]
    x = jnp.asarray(_isolated_peak_map(peaks))
    nmsed = dec.hmp_nms(x)
    # both tied peaks survive NMS (each equals its 3x3 window max)
    surv = np.asarray(nmsed)[0, :, :, 0]
    assert surv[10, 10] == 5.0 and surv[10, 11] == 5.0
    k = 5
    s1, i1, _, _ = dec.topk_channel(nmsed, k)
    s2, i2, y2, x2 = dec.topk_channel_blockreduce(nmsed, k)
    s1, s2 = np.asarray(s1).ravel(), np.asarray(s2).ravel()
    assert (s1 == 5.0).sum() == 2          # plain top-k keeps the duplicate
    assert (s2 == 5.0).sum() == 1          # block-reduce collapses it
    # the representative is one of the tied positions
    assert (int(np.asarray(y2).ravel()[0]), int(np.asarray(x2).ravel()[0])) \
        in {(10, 10), (10, 11)}
    # remaining slots are the next-highest true peaks, in order
    np.testing.assert_array_equal(s2[1:4], [4.0, 3.0, 2.0])


def test_blockreduce_bf16_quantized_parity(rng):
    """bf16-quantized heatmaps (the TPU compute dtype) create exact-value
    ties at unrelated positions; value multisets must still match plain
    topk_channel, and any same-block collapse must obey the documented
    bound (no silently wrong values)."""
    x = rng.rand(2, 32, 48, 5).astype(np.float32)
    x = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    nmsed = dec.hmp_nms(jnp.asarray(x))
    k = 8
    s1, i1, _, _ = dec.topk_channel(nmsed, k)
    for use_pallas in (False, True):
        s2, i2, _, _ = dec.topk_channel_blockreduce(
            nmsed, k, use_pallas=use_pallas, pallas_interpret=use_pallas)
        a = np.sort(np.asarray(s1).reshape(-1, k), axis=-1)
        b = np.sort(np.asarray(s2).reshape(-1, k), axis=-1)
        # identical unless a same-block adjacent tie collapsed; detect that
        # case exactly and require the only divergence to be the collapse
        for row_a, row_b in zip(a, b):
            if not np.array_equal(row_a, row_b):
                # row_b must be row_a with one duplicated value removed and
                # one extra (smaller) candidate appended at the bottom
                diff = [v for v in row_a if list(row_a).count(v) >
                        list(row_b).count(v)]
                assert diff, (row_a, row_b)
