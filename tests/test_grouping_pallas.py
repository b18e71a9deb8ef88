"""Kernel-safe grouping core + Pallas kernel vs the XLA reference grouping."""
import numpy as np
import pytest
import jax.numpy as jnp

from offsetguided_tpu.config import COCO_PERSON_SKELETON
from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.ops.grouping import group_skeletons
from offsetguided_tpu.ops.pallas.grouping_pallas import (
    group_skeletons_pallas, group_skeletons_xla_core)

import sys
sys.path.insert(0, __file__.rsplit('/', 1)[0])
from test_grouping import make_person_limbs  # noqa: E402

SK = COCO_PERSON_SKELETON


def make_batch(rng, n=2):
    ls = [make_person_limbs(rng, 1 + t % 4, K=10, noise=3)[0]
          for t in range(n)]
    return np.stack(ls).astype(np.float32)


def test_core_matches_reference_grouping(rng):
    cfg = DecoderConfig(person_thre=0.06, dist_max=20.0, use_scale=True,
                        max_poses=12)
    batch = make_batch(rng, 3)
    p1, s1, c1 = group_skeletons(jnp.asarray(batch), SK, cfg)
    p2, s2, c2 = group_skeletons_xla_core(jnp.asarray(batch), SK, cfg)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_pallas_interpret_matches(rng):
    cfg = DecoderConfig(person_thre=0.06, dist_max=20.0, use_scale=True,
                        max_poses=8)
    batch = make_batch(rng, 2)
    p1, s1, c1 = group_skeletons(jnp.asarray(batch), SK, cfg)
    p2, s2, c2 = group_skeletons_pallas(jnp.asarray(batch), SK, cfg,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
