"""Peak-sampled collection must reproduce the explicit-upsample path."""
import numpy as np
import jax.numpy as jnp

from offsetguided_tpu.config import COCO_PERSON_SKELETON, skeleton_from_arrays
from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.ops import decoder as dec
from offsetguided_tpu.ops.resize import upsample2d


def test_blockreduce_topk_matches_plain(rng):
    x = rng.rand(2, 16, 20, 5).astype(np.float32)
    nmsed = dec.hmp_nms(jnp.asarray(x))
    s1, i1, y1, x1 = dec.topk_channel(nmsed, 6)
    s2, i2, y2, x2 = dec.topk_channel_blockreduce(nmsed, 6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_sample_limb_maps_matches_upsample_gather(rng):
    n, h, w, L = 2, 8, 9, 19
    stride = 4
    maps = rng.randn(n, h, w, 2 * L).astype(np.float32)
    xs = rng.randint(0, w * stride, (n, L, 5)).astype(np.int32)
    ys = rng.randint(0, h * stride, (n, L, 5)).astype(np.int32)
    for method in ('bilinear', 'bicubic'):
        up = np.asarray(upsample2d(jnp.asarray(maps), stride, method))
        ch = 2 * np.arange(L, dtype=np.int32)
        got = np.asarray(dec.sample_limb_maps(
            jnp.asarray(maps), ch, jnp.asarray(xs), jnp.asarray(ys), stride,
            method))[..., 0]
        want = np.zeros_like(got)
        for b in range(n):
            for l in range(L):
                for k in range(5):
                    want[b, l, k] = up[b, ys[b, l, k], xs[b, l, k], 2 * l]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_peak_sampled_matches_full_upsample(rng):
    n, h, w, c = 2, 12, 10, 17
    stride = 4
    jf, jt = skeleton_from_arrays(COCO_PERSON_SKELETON)
    L = len(jf)
    cfg = DecoderConfig(topk=8, thre_hmp=0.08)
    hmp = rng.rand(n, h, w, c).astype(np.float32)
    offs = (rng.randn(n, h, w, 2 * L) * 3).astype(np.float32)
    jomps = (rng.randn(n, h, w, 2) * 0.5).astype(np.float32)
    scmps = (rng.rand(n, h, w, c) * 8).astype(np.float32)

    hmp_up = upsample2d(jnp.asarray(hmp), stride, 'bicubic')
    # explicit full upsample path
    full = dec.collect_limbs(
        hmp_up, upsample2d(jnp.asarray(offs), stride, 'bilinear'), jf, jt,
        cfg, jomps=upsample2d(jnp.asarray(jomps), stride, 'bilinear'),
        scmps=upsample2d(jnp.asarray(scmps), stride, 'bicubic'))
    # peak-sampled path
    fast = dec.collect_limbs_peak_sampled(
        hmp_up, jnp.asarray(offs), jf, jt, cfg, jomps4=jnp.asarray(jomps),
        scmps4=jnp.asarray(scmps), stride=stride)
    a = np.asarray(dec.pack_limbs(full))
    b = np.asarray(dec.pack_limbs(fast))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_topk_segmented_exact(rng):
    from offsetguided_tpu.ops.decoder import _topk_segmented
    import jax.numpy as jnp, jax
    x = jnp.asarray(rng.rand(3, 5, 6400).astype(np.float32))
    v1, i1 = jax.lax.top_k(x, 16)
    v2, i2 = _topk_segmented(x, 16)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=0)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_topk_pallas_interpret_matches(rng):
    from offsetguided_tpu.ops.pallas.topk_pallas import topk_pallas
    import jax
    x = np.zeros((6, 16, 24), np.float32)
    m = rng.rand(*x.shape) < 0.05
    x[m] = rng.rand(m.sum()).astype(np.float32)
    v, i = topk_pallas(jnp.asarray(x), 5, interpret=True)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x).reshape(6, -1), 5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=0)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_blockreduce_pallas_path_interpret(rng):
    x = rng.rand(2, 16, 20, 5).astype(np.float32)
    nmsed = dec.hmp_nms(jnp.asarray(x))
    s1, i1, y1, x1 = dec.topk_channel_blockreduce(nmsed, 6)
    s2, i2, y2, x2 = dec.topk_channel_blockreduce(nmsed, 6, use_pallas=True,
                                                  pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fused_nms_topk_interpret(rng):
    from offsetguided_tpu.ops.pallas.nms_topk_pallas import nms_topk_pallas
    import jax
    x = rng.rand(4, 24, 32).astype(np.float32)
    v, i = nms_topk_pallas(jnp.asarray(x), 6, interpret=True)
    nhwc = jnp.asarray(x[:, :, :, None])
    nm = np.asarray(dec.hmp_nms(nhwc))[:, :, :, 0].reshape(4, -1)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(nm), 6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_fused_peaks_kernel_matches_xla_chain(rng):
    """fused_peaks_topk_pallas == upsample2d_matmul + NMS + block-reduce
    top-k + within-block argmax (the XLA chain it replaces)."""
    from offsetguided_tpu.ops.pallas.peaks_pallas import fused_peaks_topk_pallas
    from offsetguided_tpu.ops.resize import upsample2d_matmul

    b, h, k, stride = 5, 16, 6, 4
    x = (rng.rand(b, h, h).astype(np.float32)) ** 4
    xn = jnp.asarray(x)

    vals, ys, xs = fused_peaks_topk_pallas(xn, k, factor=stride,
                                           method='bicubic', interpret=True)

    up = upsample2d_matmul(xn[..., None], stride, 'bicubic')
    nmsed = dec.hmp_nms(up)
    s_ref, i_ref, y_ref, x_ref = dec.topk_channel_blockreduce(
        nmsed.transpose(0, 3, 1, 2).reshape(b, 1, h * stride, h * stride)
        .transpose(0, 2, 3, 1), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(s_ref)[:, 0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(y_ref)[:, 0])
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x_ref)[:, 0])


def test_fused_peaks_map_batched_matches_single(rng):
    """maps_per_step > 1 is bit-identical to the single-map kernel, including
    tie-breaking (quantized values force equal peaks) and a batch size not
    divisible by the map batch (zero-padded tail maps sliced off)."""
    from offsetguided_tpu.ops.pallas.peaks_pallas import fused_peaks_topk_pallas

    h, k, stride = 16, 6, 4
    for b, mb in ((6, 3), (5, 2), (4, 4)):
        # coarse quantization -> many exact-value ties across and within maps
        x = np.round(rng.rand(b, h, h).astype(np.float32) * 8) / 8
        xn = jnp.asarray(x)
        v1, y1, x1 = fused_peaks_topk_pallas(xn, k, factor=stride,
                                             method='bicubic', interpret=True)
        vb, yb, xb = fused_peaks_topk_pallas(xn, k, factor=stride,
                                             method='bicubic', interpret=True,
                                             maps_per_step=mb)
        np.testing.assert_array_equal(np.asarray(vb), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(yb), np.asarray(y1))
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(x1))


def test_collect_fused_matches_sampled(rng):
    """collect_limbs_peak_fused == collect_limbs_peak_sampled end to end."""
    n, h, c = 2, 12, 17
    stride = 4
    jf, jt = skeleton_from_arrays(COCO_PERSON_SKELETON)
    L = len(jf)
    cfg = DecoderConfig(topk=8, thre_hmp=0.08)
    hmp = rng.rand(n, h, h, c).astype(np.float32)
    offs = (rng.randn(n, h, h, 2 * L) * 3).astype(np.float32)
    jomps = (rng.randn(n, h, h, 2) * 0.5).astype(np.float32)
    scmps = (rng.rand(n, h, h, c) * 8).astype(np.float32)

    from offsetguided_tpu.ops.resize import upsample2d_matmul
    hmp_up = upsample2d_matmul(jnp.asarray(hmp), stride, 'bicubic')
    ref = dec.collect_limbs_peak_sampled(
        hmp_up, jnp.asarray(offs), jf, jt, cfg, jomps4=jnp.asarray(jomps),
        scmps4=jnp.asarray(scmps), stride=stride)
    got = dec.collect_limbs_peak_fused(
        jnp.asarray(hmp), jnp.asarray(offs), jf, jt, cfg,
        jomps4=jnp.asarray(jomps), scmps4=jnp.asarray(scmps), stride=stride,
        interpret=True)
    a = np.asarray(dec.pack_limbs(ref))
    g = np.asarray(dec.pack_limbs(got))
    np.testing.assert_allclose(g, a, rtol=2e-4, atol=2e-4)


def test_collect_limbs_pallas_topk_matches_plain(rng):
    """collect_limbs with the fused NMS+top-k Pallas path (interpret mode)
    == the plain joint_dets path, end to end through pairing."""
    n, h, w, c = 2, 20, 24, 17
    jf, jt = skeleton_from_arrays(COCO_PERSON_SKELETON)
    L = len(jf)
    cfg = DecoderConfig(topk=8, thre_hmp=0.08, pallas_grouping='off')
    hmp = rng.rand(n, h, w, c).astype(np.float32)
    offs = (rng.randn(n, h, w, 2 * L) * 3).astype(np.float32)
    scmps = (rng.rand(n, h, w, c) * 8).astype(np.float32)

    plain = dec.collect_limbs(jnp.asarray(hmp), jnp.asarray(offs), jf, jt,
                              cfg, scmps=jnp.asarray(scmps))
    fused = dec.collect_limbs(jnp.asarray(hmp), jnp.asarray(offs), jf, jt,
                              cfg, scmps=jnp.asarray(scmps),
                              pallas_interpret=True)
    a = np.asarray(dec.pack_limbs(plain))
    b = np.asarray(dec.pack_limbs(fused))
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)


def test_sample_impls_agree_including_sentinels(rng):
    """'gather' (one fused take_along_axis) and 'dense' (MXU contraction)
    sampling must agree bit-for-bit-ish on finite values AND poison the same
    samples when +-inf/NaN sentinels sit anywhere in the tap footprint."""
    n, h, w, L, K = 2, 8, 9, 5, 7
    stride = 4
    maps = rng.randn(n, h, w, 2 * L).astype(np.float32)
    # scatter sentinels: some at clipped borders, some interior
    maps[0, 0, 0, 0] = np.inf
    maps[0, 3, 4, 2] = -np.inf
    maps[1, 7, 8, 1] = np.nan
    xs = rng.randint(-3, w * stride + 3, (n, L, K)).astype(np.int32)
    ys = rng.randint(-3, h * stride + 3, (n, L, K)).astype(np.int32)
    ch = rng.randint(0, 2 * L, (L,)).astype(np.int32)
    for method in ('bilinear', 'bicubic'):
        for channels in (ch, None):
            a = np.asarray(dec.sample_limb_maps(
                jnp.asarray(maps), channels, jnp.asarray(xs),
                jnp.asarray(ys), stride, method, impl='gather'))
            b = np.asarray(dec.sample_limb_maps(
                jnp.asarray(maps), channels, jnp.asarray(xs),
                jnp.asarray(ys), stride, method, impl='dense'))
            assert a.shape == b.shape
            pa, pb = np.isposinf(a), np.isposinf(b)
            np.testing.assert_array_equal(pa, pb)
            np.testing.assert_allclose(a[~pa], b[~pb], rtol=2e-4, atol=2e-4)
