"""PostProcessor decode pipeline: flip-merge invariance + end-to-end smoke."""
import numpy as np
import jax.numpy as jnp

from offsetguided_tpu.config.defaults import DecoderConfig, SkeletonConfig
from offsetguided_tpu.decoder import PostProcessor


def make_preds(rng, n=2, h=16, w=16, with_aux=True):
    return {
        'hmp': [jnp.asarray(rng.rand(n, h, w, 17).astype(np.float32))],
        'bg': [None],
        'jomp': [jnp.asarray((rng.randn(n, h, w, 2) * 0.5).astype(np.float32))
                 if with_aux else None],
        'omp': [jnp.asarray((rng.randn(n, h, w, 38) * 3).astype(np.float32))],
        'spread': [None],
        'scmp': [jnp.asarray((rng.rand(n, h, w, 17) * 8).astype(np.float32))
                 if with_aux else None],
    }


def test_flip_merge_equivariant_net_is_identity(rng):
    """If the network were perfectly mirror-equivariant, flip-merging must
    return the original prediction unchanged."""
    pp = PostProcessor()
    n, h, w = 2, 8, 8
    kp_flip = np.asarray(pp._kp_flip)
    limb_flip = np.asarray(pp._limb_flip)
    reserve = np.asarray(pp._reserve)

    hmp = rng.rand(n, h, w, 17).astype(np.float32)
    hmp_f = np.flip(hmp[..., kp_flip], axis=2)

    jomp = rng.randn(n, h, w, 2).astype(np.float32)
    jomp_f = np.flip(jomp, axis=2).copy()
    jomp_f[..., 0] *= -1

    omp = rng.randn(n, h, w, 19, 2).astype(np.float32)
    # mirror-equivariant flipped offsets: off'(l) s.t. unflip+negate+perm
    # recovers off. Build off'[limb_flip[l]] = flip_w(negate_x(off[l])).
    omp_f = np.empty_like(omp)
    for l in range(19):
        v = np.flip(omp[..., l, :], axis=2).copy()
        v[..., 0] *= -1
        omp_f[..., limb_flip[l], :] = v
    # garbage on reserved (direction-reversed) limbs: merge must ignore them
    omp_f[..., reserve, :] = 1e3

    scmp = (rng.rand(n, h, w, 17) * 8).astype(np.float32)
    scmp_f = np.flip(scmp[..., kp_flip], axis=2)

    maps = {
        'hmp': jnp.asarray(np.concatenate([hmp, hmp_f])),
        'jomp': jnp.asarray(np.concatenate([jomp, jomp_f])),
        'omp': jnp.asarray(np.concatenate([omp, omp_f]).reshape(2 * n, h, w, 38)),
        'scmp': jnp.asarray(np.concatenate([scmp, scmp_f])),
    }
    merged = pp.flip_merge(maps)
    np.testing.assert_allclose(np.asarray(merged['hmp']), hmp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged['jomp']), jomp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged['omp']),
                               omp.reshape(n, h, w, 38), atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged['scmp']), scmp, atol=1e-5)


def test_decode_modes_run(rng):
    preds = make_preds(rng)
    for upsampled in (True, False):
        pp = PostProcessor(cfg=DecoderConfig(topk=6, max_poses=8,
                                             upsampled_decode=upsampled))
        poses, scores, counts = pp.decode(preds, flip_test=False)
        assert poses.shape == (2, 8, 17, 6)
        assert scores.shape == (2, 8)
        # scores sorted descending
        sc = np.asarray(scores)
        assert np.all(np.diff(sc, axis=1) <= 1e-6)


def test_scored_offset_pipeline(rng):
    """scored_offset=True runs end to end and actually changes the decode
    (reference opt-in path: decoder/factory.py:70-72 + offset.py:8-43)."""
    preds = make_preds(rng)
    base = PostProcessor(cfg=DecoderConfig(topk=6, max_poses=8))
    refined = PostProcessor(cfg=DecoderConfig(topk=6, max_poses=8,
                                              scored_offset=True))
    p0, s0, _ = base.decode(preds)
    p1, s1, _ = refined.decode(preds)
    assert p1.shape == p0.shape
    # the weighted averaging perturbs guiding offsets, so some limb pairing
    # (and hence pose output) must differ on random maps
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # refinement must also agree with applying the op manually upfront
    from offsetguided_tpu.ops import decoder as dec
    jf = np.asarray(base._jf)
    omp_ref = dec.scored_offset(preds['hmp'][0], preds['omp'][0], jf, 3)
    manual = dict(preds)
    manual['omp'] = [omp_ref]
    p2, s2, _ = base.decode(manual)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_decode_crowdpose_skeleton(rng):
    sk = SkeletonConfig.crowdpose()
    n, h, w = 1, 8, 8
    preds = {
        'hmp': [jnp.asarray(rng.rand(n, h, w, 14).astype(np.float32))],
        'bg': [None], 'jomp': [None], 'spread': [None], 'scmp': [None],
        'omp': [jnp.asarray(rng.randn(n, h, w, 2 * sk.n_limbs)
                            .astype(np.float32))],
    }
    pp = PostProcessor(skeleton=sk, cfg=DecoderConfig(topk=4, max_poses=4))
    poses, scores, counts = pp.decode(preds)
    assert poses.shape == (1, 4, 14, 6)
