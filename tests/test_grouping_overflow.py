"""Grouping capacity overflow: measured drop behavior.

The reference grows its per-image skeleton list unboundedly
(decoder/group.py:166-177); the fixed-shape TPU grouping holds at most
`DecoderConfig.capacity` intermediate rows. When more concurrent skeletons
exist than rows, limbs that would START a new skeleton find no free slot and
are dropped. Candidates arrive in per-channel top-k (score-descending) order,
so the dropped skeletons are the lowest-scored ones of that limb iteration.
"""
import numpy as np

import jax.numpy as jnp

from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.ops.grouping import group_skeletons


def make_crowd(n_limbs_valid: int, k: int = 96, L: int = 19):
    """packed (1, L, K, 13): limb type 0 has `n_limbs_valid` disjoint valid
    candidates (distinct keypoint inds, descending score); other limb types
    have none (off-image)."""
    packed = np.zeros((1, L, k, 13), np.float32)
    packed[..., 0:2] = -100000.0      # off-image => invalid
    packed[..., 3:5] = -100000.0
    for i in range(n_limbs_valid):
        x = 10.0 + 6.0 * i
        packed[0, 0, i, 0:3] = [x, 10.0, 0.9]
        packed[0, 0, i, 3:6] = [x, 20.0, 0.9]
        packed[0, 0, i, 6] = 1000 + 2 * i        # ind1
        packed[0, 0, i, 7] = 1001 + 2 * i        # ind2
        packed[0, 0, i, 8] = 1.0                 # len_delta (passes gate)
        packed[0, 0, i, 9] = 10.0
        packed[0, 0, i, 10] = 1.0 - 0.005 * i    # descending limb score
        packed[0, 0, i, 11:13] = 5.0
    return jnp.asarray(packed)


def run(n_valid, capacity):
    cfg = DecoderConfig(topk=96, dist_max=40.0, use_scale=False,
                        person_thre=0.05, max_poses=96, capacity=capacity)
    skeleton = tuple((i % 17, (i + 1) % 17) for i in range(19))
    # limb type 0 connects joints 0 -> 1
    poses, scores, counts = group_skeletons(
        make_crowd(n_valid), skeleton, cfg, n_keypoints=17,
        capacity=capacity)
    return np.asarray(poses), np.asarray(scores), int(counts[0])


def test_under_capacity_keeps_all():
    _, scores, count = run(40, capacity=64)
    assert count == 40
    assert (scores[0, :40] > 0).all()


def test_overflow_drops_lowest_scored():
    """78 concurrent skeletons, 64 rows: exactly 64 survive, and they are
    the 64 highest-scored candidates (candidates arrive score-descending)."""
    poses, scores, count = run(78, capacity=64)
    assert count == 64
    # survivors are candidates 0..63: their x coordinates are 10 + 6*i
    xs = np.sort(poses[0, :64, 0, 0])
    np.testing.assert_allclose(xs, 10.0 + 6.0 * np.arange(64), atol=1e-4)


def test_larger_capacity_recovers_all():
    _, _, count = run(78, capacity=128)
    assert count == 78
