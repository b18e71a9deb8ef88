"""cat_flip_offs (4-D offset flip merge) + guiding-endpoint jitter refine.

Covers the two reference behaviors implemented for CLI parity:
- `--cat-flip-offset`: flip-test keeps BOTH offset vectors and pairs
  keypoints by the 4-D distance |[g1;g2] - [t;t]| (reference
  decoder/factory.py:115-127 + collect.py:143-177 vector_nd=4).
- guiding refine: the regressed endpoint is nudged by the jitter offset
  sampled at its truncated-integer position before the pairing min
  (reference collect.py:158-165), skipped when off-image.
"""
import numpy as np
import jax.numpy as jnp

from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.decoder import PostProcessor
from offsetguided_tpu.ops import decoder as dec

from test_pipeline import make_preds


def test_cat_flip_merge_layout_and_reserve(rng):
    """Mirror-equivariant flipped half-batch: BOTH 4-D vector halves must
    equal the original offsets, including on reserved limbs where the
    flipped prediction is garbage (the reserve rule must copy the original
    into the second half, reference factory.py:121-125)."""
    pp = PostProcessor(cfg=DecoderConfig(cat_flip_offs=True))
    n, h, w = 2, 8, 8
    kp_flip = np.asarray(pp._kp_flip)
    limb_flip = np.asarray(pp._limb_flip)
    reserve = np.asarray(pp._reserve)
    assert len(reserve) > 0

    hmp = rng.rand(n, h, w, 17).astype(np.float32)
    hmp_f = np.flip(hmp[..., kp_flip], axis=2)
    omp = rng.randn(n, h, w, 19, 2).astype(np.float32)
    omp_f = np.empty_like(omp)
    for l in range(19):
        v = np.flip(omp[..., l, :], axis=2).copy()
        v[..., 0] *= -1
        omp_f[..., limb_flip[l], :] = v
    omp_f[..., reserve, :] = 1e3      # garbage: reserve rule must ignore it

    maps = {
        'hmp': jnp.asarray(np.concatenate([hmp, hmp_f])),
        'jomp': None,
        'omp': jnp.asarray(np.concatenate([omp, omp_f]).reshape(2 * n, h, w, 38)),
        'scmp': None,
    }
    merged = np.asarray(pp.flip_merge(maps)['omp'])
    assert merged.shape == (n, h, w, 4 * 19)
    m4 = merged.reshape(n, h, w, 19, 4)
    np.testing.assert_allclose(m4[..., 0:2], omp, atol=1e-5)
    np.testing.assert_allclose(m4[..., 2:4], omp, atol=1e-5)


def _two_target_scene():
    """One start peak (ch 0) and two end candidates (ch 1): A=(16,8) with the
    higher score (so it takes top-k slot 0 and wins argmin ties), B=(8,16)."""
    h = w = 32
    hmp = np.zeros((1, h, w, 2), np.float32)
    hmp[0, 8, 8, 0] = 0.9          # start at (x=8, y=8)
    hmp[0, 8, 16, 1] = 0.8         # A at (x=16, y=8)
    hmp[0, 16, 8, 1] = 0.7         # B at (x=8, y=16)
    return hmp


def test_collect_limbs_vector4_uses_4d_metric():
    """First vector alone ties A/B (argmin -> A); the second vector points
    at B, so the 4-D metric must flip the match to B and min_dist must be
    the 4-D norm."""
    hmp = jnp.asarray(_two_target_scene())
    jf, jt = np.asarray([0]), np.asarray([1])
    cfg = DecoderConfig(topk=2, thre_hmp=0.1, use_jitter_offset=False)

    # g1 = (14, 14): equidistant from A(16,8) and B(8,16)
    v1 = (6.0, 6.0)
    offs2 = np.zeros((1, 32, 32, 2), np.float32)
    offs2[0, 8, 8] = v1
    limbs2 = dec.collect_limbs(hmp, jnp.asarray(offs2), jf, jt, cfg)
    np.testing.assert_allclose(np.asarray(limbs2.xy_t)[0, 0, 0], [16.0, 8.0])

    # g2 = (8.1, 15.9): decisively B
    v2 = (0.1, 7.9)
    offs4 = np.zeros((1, 32, 32, 4), np.float32)
    offs4[0, 8, 8] = v1 + v2
    limbs4 = dec.collect_limbs(hmp, jnp.asarray(offs4), jf, jt, cfg)
    np.testing.assert_allclose(np.asarray(limbs4.xy_t)[0, 0, 0], [8.0, 16.0])
    g1 = np.array([14.0, 14.0])
    g2 = np.array([8.1, 15.9])
    b = np.array([8.0, 16.0])
    want = np.sqrt(np.sum((g1 - b) ** 2) + np.sum((g2 - b) ** 2))
    np.testing.assert_allclose(np.asarray(limbs4.min_dist)[0, 0, 0], want,
                               rtol=1e-5)


def test_guid_jitter_refine_moves_match():
    """A constant jitter field moves the tied guiding endpoint onto B; with
    refine off the tie goes to A (higher-scored top-k slot)."""
    hmp_up = jnp.asarray(_two_target_scene())
    jf, jt = np.asarray([0]), np.asarray([1])
    offs = np.zeros((1, 8, 8, 2), np.float32)
    offs[:] = (6.0, 6.0)           # guid = (14, 14): tie between A and B
    jomp = np.zeros((1, 8, 8, 2), np.float32)
    jomp[:] = (-5.9, 1.9)          # refined guid = (8.1, 15.9): B

    kw = dict(jomps4=jnp.asarray(jomp), scmps4=None, stride=4)
    off = dec.collect_limbs_peak_sampled(
        hmp_up, jnp.asarray(offs), jf, jt,
        DecoderConfig(topk=2, thre_hmp=0.1, use_jitter_offset=False), **kw)
    on = dec.collect_limbs_peak_sampled(
        hmp_up, jnp.asarray(offs), jf, jt,
        DecoderConfig(topk=2, thre_hmp=0.1, use_jitter_offset=False,
                      guid_jitter_refine=True), **kw)
    np.testing.assert_allclose(np.asarray(off.xy_t)[0, 0, 0], [16.0, 8.0])
    np.testing.assert_allclose(np.asarray(on.xy_t)[0, 0, 0], [8.0, 16.0])


def test_guid_jitter_refine_skips_off_image():
    """Endpoints regressed off the image must NOT be refined (reference
    collect.py:162 bounds check): output matches refine-off exactly."""
    hmp_up = jnp.asarray(_two_target_scene())
    jf, jt = np.asarray([0]), np.asarray([1])
    offs = np.zeros((1, 8, 8, 2), np.float32)
    offs[:] = (200.0, 200.0)       # guid = (208, 208): far off the 32x32 map
    jomp = np.full((1, 8, 8, 2), 3.0, np.float32)

    kw = dict(jomps4=jnp.asarray(jomp), scmps4=None, stride=4)
    cfg_off = DecoderConfig(topk=2, thre_hmp=0.1, use_jitter_offset=False)
    cfg_on = DecoderConfig(topk=2, thre_hmp=0.1, use_jitter_offset=False,
                           guid_jitter_refine=True)
    off = dec.collect_limbs_peak_sampled(hmp_up, jnp.asarray(offs), jf, jt,
                                         cfg_off, **kw)
    on = dec.collect_limbs_peak_sampled(hmp_up, jnp.asarray(offs), jf, jt,
                                        cfg_on, **kw)
    np.testing.assert_allclose(np.asarray(on.xy_t), np.asarray(off.xy_t))
    np.testing.assert_allclose(np.asarray(on.min_dist),
                               np.asarray(off.min_dist))


def test_cat_flip_decode_end_to_end(rng):
    """Full decode with flip_test + cat_flip_offs on a mirror-equivariant
    doubled batch: runs through both decode resolutions, and since both
    4-D halves equal the averaged 2-D vector, the matched pairs are
    identical to the standard merge (scores differ only through the
    sqrt(2)-scaled min_dist in exp(-d/len))."""
    preds = make_preds(rng, n=1, h=16, w=16, with_aux=True)
    n, h, w = 1, 16, 16
    kp_flip, limb_flip, reserve = (np.asarray(PostProcessor()._kp_flip),
                                   np.asarray(PostProcessor()._limb_flip),
                                   np.asarray(PostProcessor()._reserve))
    hmp = np.asarray(preds['hmp'][0])
    omp = np.asarray(preds['omp'][0]).reshape(n, h, w, 19, 2)
    jomp = np.asarray(preds['jomp'][0])
    scmp = np.asarray(preds['scmp'][0])

    hmp_f = np.flip(hmp[..., kp_flip], axis=2)
    jomp_f = np.flip(jomp, axis=2).copy()
    jomp_f[..., 0] *= -1
    omp_f = np.empty_like(omp)
    for l in range(19):
        v = np.flip(omp[..., l, :], axis=2).copy()
        v[..., 0] *= -1
        omp_f[..., limb_flip[l], :] = v
    scmp_f = np.flip(scmp[..., kp_flip], axis=2)

    doubled = {
        'hmp': [jnp.asarray(np.concatenate([hmp, hmp_f]))],
        'bg': [None],
        'jomp': [jnp.asarray(np.concatenate([jomp, jomp_f]))],
        'omp': [jnp.asarray(np.concatenate([omp, omp_f])
                            .reshape(2 * n, h, w, 38))],
        'spread': [None],
        'scmp': [jnp.asarray(np.concatenate([scmp, scmp_f]))],
    }
    for upsampled in (True, False):
        avg = PostProcessor(cfg=DecoderConfig(
            topk=4, max_poses=8, upsampled_decode=upsampled))
        cat = PostProcessor(cfg=DecoderConfig(
            topk=4, max_poses=8, upsampled_decode=upsampled,
            cat_flip_offs=True))
        pa = avg.decode_packed_limbs(doubled, flip_test=True)
        pc = cat.decode_packed_limbs(doubled, flip_test=True)
        # identical matches: endpoints, indices, scales
        for col in (0, 1, 3, 4, 6, 7, 11, 12):
            np.testing.assert_allclose(np.asarray(pc[..., col]),
                                       np.asarray(pa[..., col]), atol=1e-4)
        # 4-D min_dist = sqrt(2) * 2-D min_dist when both halves agree
        np.testing.assert_allclose(np.asarray(pc[..., 8]),
                                   np.sqrt(2.0) * np.asarray(pa[..., 8]),
                                   rtol=1e-4, atol=1e-4)
        poses, scores, counts = cat._decode_body(doubled, flip_test=True)
        assert poses.shape[2:] == (17, 6)
        assert np.isfinite(np.asarray(scores)).all()
