import numpy as np

from offsetguided_tpu import config
from offsetguided_tpu.config import crowdpose


def test_skeleton_sizes():
    assert len(config.COCO_PERSON_SKELETON) == 19
    assert len(config.COCO_PERSON_WITH_REDUNDANT_SKELETON) == 31
    assert len(config.DENSER_COCO_PERSON_SKELETON) == 44
    # the reference's REDUNDANT_CONNECTIONS holds 29 limbs despite the 'omp25'
    # head name (config/coco_data.py:38-42 computes a 29-element list)
    assert len(config.REDUNDANT_CONNECTIONS) == 29
    assert len(config.KINEMATIC_TREE_SKELETON) == 16
    assert len(config.COCO_KEYPOINTS) == 17
    assert len(config.COCO_PERSON_SIGMAS) == 17
    for size, sk in config.SKELETONS_BY_SIZE.items():
        if size != 25:
            assert len(sk) == size


def test_heatmap_hflip_is_left_right_swap():
    perm = config.heatmap_hflip()
    # applying the permutation twice is identity
    assert np.array_equal(perm[perm], np.arange(17))
    # nose is self-symmetric
    assert perm[0] == 0
    # left_eye(1) <-> right_eye(2)
    assert perm[1] == 2 and perm[2] == 1
    # every left keypoint maps to a right one
    for li, ri in zip(config.LEFT_INDEX, config.RIGHT_INDEX):
        assert perm[li] == ri and perm[ri] == li


def test_offset_hflip_default_skeleton():
    flip_indices, reserve_indices = config.offset_hflip()
    assert flip_indices.shape == (19,)
    # limbs whose mirror reverses direction: the published reference values for
    # COCO_PERSON_SKELETON (config/coco_data.py:130-153 semantics)
    # e.g. limb 6 (right_ear->right_shoulder) mirrors to (left_ear->left_shoulder)
    # which is limb 7 stored as (left_ear, left_shoulder).
    assert flip_indices[0] == 1 and flip_indices[1] == 0  # nose->eyes swap
    # flip twice returns original limb for non-reversed limbs
    non_reserved = np.setdiff1d(np.arange(19), reserve_indices)
    assert np.array_equal(flip_indices[flip_indices[non_reserved]], non_reserved)
    # self-symmetric limbs (shoulder bridge 5, hip bridge 14) must be reserved
    assert 5 in reserve_indices and 14 in reserve_indices


def test_offset_hflip_redundant_skeleton_runs():
    for size in (16, 25, 31, 44):
        sk = config.SKELETONS_BY_SIZE[size]
        flip_indices, reserve = config.offset_hflip(skeleton=sk)
        assert flip_indices.shape == (len(sk),)
        assert np.all(flip_indices >= 0) and np.all(flip_indices < len(sk))


def test_crowdpose_config():
    cfg = config.SkeletonConfig.crowdpose()
    assert cfg.n_keypoints == 14
    assert cfg.n_limbs == len(crowdpose.CROWDPOSE_PERSON_SKELETON)
    perm = cfg.heatmap_flip_indices()
    assert np.array_equal(perm[perm], np.arange(14))
    flip_indices, reserve = cfg.offset_flip_indices()
    assert flip_indices.shape == (cfg.n_limbs,)


def test_configs_construct():
    config.EncoderConfig()
    config.DecoderConfig()
    config.ModelConfig()
    config.LossConfig()
    config.TrainConfig()
    config.EvalConfig()
    sk = config.SkeletonConfig.coco(31)
    assert sk.n_limbs == 31
