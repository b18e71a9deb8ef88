"""On-device grouping vs the sequential NumPy reference + hand-built scenarios."""
import numpy as np
import jax.numpy as jnp

from offsetguided_tpu.config import COCO_PERSON_SKELETON
from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.ops.grouping import group_skeletons
from offsetguided_tpu.ops.grouping_ref import group_skeletons_ref

SK = COCO_PERSON_SKELETON
L = len(SK)
J = 17


def make_person_limbs(rng, n_persons, K=12, noise=4, img=100.0):
    """Synthesize coherent candidate limbs for `n_persons` plus noise conns."""
    # unique global ind per (person, joint)
    joints = rng.rand(n_persons, J, 2) * img + 1.0
    inds = np.arange(n_persons * J).reshape(n_persons, J) + 7  # arbitrary offset
    limbs = np.zeros((L, K, 13), dtype=np.float64)
    limbs[:, :, 0:2] = -99999.0  # default: off-image
    limbs[:, :, 3:5] = -99999.0
    for l, (jf, jt) in enumerate(SK):
        k = 0
        for p in range(n_persons):
            xy_f, xy_t = joints[p, jf], joints[p, jt]
            v1, v2 = 0.5 + 0.5 * rng.rand(2)
            length = max(np.linalg.norm(xy_f - xy_t), 0.5)
            delta = rng.rand() * 2.0
            limbs[l, k] = [xy_f[0], xy_f[1], v1, xy_t[0], xy_t[1], v2,
                           inds[p, jf], inds[p, jt], delta, length,
                           v1 * v2 * np.exp(-delta / length), 6.0, 6.0]
            k += 1
        for _ in range(noise):
            if k >= K:
                break
            xy_f, xy_t = rng.rand(2, 2) * img
            v1, v2 = rng.rand(2) * 0.3
            delta = 25 + rng.rand() * 50  # exceeds dist_max -> invalid
            limbs[l, k] = [xy_f[0], xy_f[1], v1, xy_t[0], xy_t[1], v2,
                           10000 + rng.randint(10000), 20000 + rng.randint(10000),
                           delta, 10.0, 0.01, 6.0, 6.0]
            k += 1
    return limbs, joints, inds


def run_both(limbs, cfg):
    ref_poses, ref_scores = group_skeletons_ref(
        limbs, SK, person_thre=cfg.person_thre, sort_dim=cfg.sort_dim,
        dist_max=cfg.dist_max, use_scale=cfg.use_scale, n_keypoints=J,
        max_poses=cfg.max_poses)
    poses, scores, counts = group_skeletons(
        jnp.asarray(limbs[None]), SK, cfg, n_keypoints=J)
    return (ref_poses, ref_scores,
            np.asarray(poses[0]), np.asarray(scores[0]), int(counts[0]))


def test_two_clean_persons(rng):
    limbs, joints, inds = make_person_limbs(rng, 2, noise=0)
    cfg = DecoderConfig(person_thre=0.06, dist_max=20.0, use_scale=True)
    ref_poses, ref_scores, poses, scores, count = run_both(limbs, cfg)
    assert count == 2 and len(ref_scores) == 2
    np.testing.assert_allclose(scores[:2], ref_scores, rtol=1e-5)
    # every person's joints fully recovered with correct coordinates
    for m in range(2):
        got_inds = set(poses[m, :, 5].astype(int))
        p = int(poses[m, 0, 5] - 7) // J  # which person this row is
        assert got_inds == set(inds[p])
        np.testing.assert_allclose(poses[m, :, :2], joints[p], atol=1e-4)


def test_noise_conns_rejected(rng):
    limbs, _, _ = make_person_limbs(rng, 3, noise=4)
    cfg = DecoderConfig(person_thre=0.06, dist_max=20.0, use_scale=True)
    ref_poses, ref_scores, poses, scores, count = run_both(limbs, cfg)
    assert count == len(ref_scores) == 3


def test_fuzz_matches_reference(rng):
    cfg = DecoderConfig(person_thre=0.06, dist_max=20.0, use_scale=True,
                        max_poses=20)
    for trial in range(8):
        n_persons = rng.randint(1, 6)
        limbs, _, _ = make_person_limbs(rng, n_persons, K=10, noise=3)
        # random perturbations: drop some limbs, shuffle candidate order
        for l in range(L):
            perm = rng.permutation(limbs.shape[1])
            limbs[l] = limbs[l][perm]
            if rng.rand() < 0.5:  # knock out one conn
                limbs[l, rng.randint(limbs.shape[1]), 0] = -99999.0
        ref_poses, ref_scores, poses, scores, count = run_both(limbs, cfg)
        assert count == len(ref_scores), f'trial {trial}'
        np.testing.assert_allclose(np.sort(scores[:count])[::-1],
                                   np.sort(ref_scores)[::-1], rtol=1e-5)
        # match rows by score and compare contents
        for m in range(count):
            diffs = np.abs(ref_scores - scores[m])
            r = int(np.argmin(diffs))
            np.testing.assert_allclose(poses[m], ref_poses[r], atol=1e-4,
                                       err_msg=f'trial {trial} row {m}')


def test_empty_input():
    limbs = np.zeros((L, 8, 13))
    limbs[:, :, 0:2] = -99999.0
    limbs[:, :, 3:5] = -99999.0
    cfg = DecoderConfig()
    ref_poses, ref_scores, poses, scores, count = run_both(limbs, cfg)
    assert count == 0 and len(ref_scores) == 0
    assert np.all(poses == 0)


def test_merge_two_half_skeletons(rng):
    """Two limb chains that only connect at a later limb type must merge."""
    cfg = DecoderConfig(person_thre=0.01, dist_max=20.0, use_scale=False)
    limbs = np.zeros((L, 4, 13))
    limbs[:, :, 0:2] = -99999.0
    limbs[:, :, 3:5] = -99999.0
    # limb 0: nose(ind 1)->left_eye(ind 2)
    limbs[0, 0] = [10, 10, .9, 12, 8, .8, 1, 2, 1.0, 3.0, .5, 6, 6]
    # limb 1: nose(ind 1)->right_eye(ind 3): shares nose -> same skeleton
    limbs[1, 0] = [10, 10, .9, 8, 8, .8, 1, 3, 1.0, 3.0, .5, 6, 6]
    # limb 2: left_eye(ind 2)->right_eye(ind 3): both already present
    limbs[2, 0] = [12, 8, .8, 8, 8, .8, 2, 3, 1.0, 4.0, .6, 6, 6]
    ref_poses, ref_scores, poses, scores, count = run_both(limbs, cfg)
    assert count == 1 == len(ref_scores)
    np.testing.assert_allclose(poses[0], ref_poses[0], atol=1e-5)


def test_soft_nms_suppresses_duplicates():
    from offsetguided_tpu.ops.grouping_ref import soft_nms
    pose = np.zeros((17, 6))
    pose[:, 0] = np.arange(17) * 20.0 + 5
    pose[:, 1] = 30.0
    pose[:, 2] = 0.9
    pose[:, 3] = 5.0
    dup = pose.copy()
    out = soft_nms(np.stack([pose, dup]))
    assert np.all(out[0, :, 2] == 0.9)       # first pose untouched
    assert np.all(out[1, :, 2] == 0.0)       # duplicate suppressed
