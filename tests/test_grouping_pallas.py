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


def test_grouping_with_inf_sentinels_and_fullres_inds(rng):
    """Real decode output contains +/-inf sentinel rows (off-image push,
    invalid distances) and flat peak indices in the millions (640^2 x4
    upsampled maps). The matmul-gather dataflow must sanitize infinities
    (0 * inf = NaN poisons skeletons) and keep index identity exact -- this
    input pattern broke the compiled TPU kernel in the field while the
    small-finite fuzz inputs passed."""
    cfg = DecoderConfig(person_thre=0.06, dist_max=20.0, use_scale=True,
                        max_poses=8)
    batch = make_batch(rng, 2).astype(np.float64)
    # shift every joint identity up to full-res flat-index magnitude
    # (identical grouping topology, exactly representable in f32)
    batch[..., 6:8] += 2_500_000.0
    base_p, base_s, base_c = group_skeletons(jnp.asarray(batch, jnp.float32),
                                             SK, cfg)
    # convert the generator's large-negative sentinels to the collector's
    # actual +/-inf scheme
    off = batch[..., 0] < -9000.0
    batch[..., 0] = np.where(off, np.inf, batch[..., 0])
    batch[..., 1] = np.where(off, np.inf, batch[..., 1])
    batch[..., 8] = np.where(off, np.inf, batch[..., 8])
    # flip-test merging averages opposing sentinels into NaN: poison a few
    # whole rows plus one valid row's scale column (NaN scale must invalidate
    # the row through the IEEE false-compare, reference numpy semantics)
    batch[:, ::3, -1, :] = np.nan
    batch[:, 1, 0, 12] = np.nan
    b = jnp.asarray(batch, jnp.float32)

    p1, s1, c1 = group_skeletons(b, SK, cfg)
    p2, s2, c2 = group_skeletons_xla_core(b, SK, cfg)
    p3, s3, c3 = group_skeletons_pallas(b, SK, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(base_c), np.asarray(c1))
    for c, s, p in ((c2, s2, p2), (c3, s3, p3)):
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p), atol=1e-4)
