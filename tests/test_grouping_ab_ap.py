"""A/B: AP effect of our grouping refinements vs strict reference semantics.

Decodes the hard-synthetic benchmark to packed candidate limbs ONCE
(PostProcessor.decode_packed_limbs), then groups the identical candidates
with (a) the shipping implementation (best-scoring extension tie-break,
one-mergee-per-target merging + settle passes) and (b) the strict port of
the reference's decoder/group.py (last-write-wins extension, all-pairs
snapshot merge). The AP delta quantifies the two documented refinements
(ops/grouping_ref.py docstring) on realistic data.

Run as a module for the 100-image measurement recorded in BENCHMARKS.md:
    python -m pytest tests/test_grouping_ab_ap.py -s   (8-image CI subset)
    python tests/test_grouping_ab_ap.py --n-images 100 (full benchmark)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
import pytest

from offsetguided_tpu.config.defaults import (DecoderConfig, EncoderConfig,
                                              SkeletonConfig)
from offsetguided_tpu.data.synthetic import make_hard_dataset
from offsetguided_tpu.decoder import PostProcessor
from offsetguided_tpu.ops.encoder import encode_targets
from offsetguided_tpu.ops.grouping import group_skeletons

from grouping_strict import group_skeletons_strict


def run_ab(img_dir, ann_file, size=640, max_persons=16):
    from offsetguided_tpu.data import transforms as T
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.eval.cocoeval import evaluate_coco_keypoints
    from offsetguided_tpu.eval.harness import poses_to_coco_results

    skeleton = SkeletonConfig()
    enc_cfg = EncoderConfig(max_persons=max_persons)
    cfg = DecoderConfig(topk=32, thre_hmp=0.04, dist_max=40.0,
                        use_scale=False, person_thre=0.1)
    pp = PostProcessor(skeleton=skeleton, cfg=cfg)
    coco = CocoJson(ann_file)
    sigmas = np.asarray(skeleton.sigmas)
    sk_pairs = tuple(zip(pp._jf, pp._jt))

    results = {'ours': [], 'strict': []}
    for img_id in coco.image_ids(with_persons=True, with_keypoints=True):
        info = coco.image_info(img_id)
        anns = T.normalize_annotations(coco.anns_for_image(img_id),
                                       skeleton.sigmas)
        meta = T.make_meta(info['width'], info['height'])
        dummy = np.zeros((info['height'], info['width'], 3), np.uint8)
        img2, anns, meta = T.rescale_long_absolute(dummy, anns, meta, size)
        _, anns, meta = T.center_pad(img2, anns, meta, size)
        padded = np.zeros((1, max_persons, 17, 4), np.float32)
        padded[0, :min(len(anns), max_persons)] = anns[:max_persons]
        t = encode_targets(jnp.asarray(padded), sigmas, skeleton.skeleton,
                           size // 4, size // 4, enc_cfg)
        preds = {'hmp': [t.hmp], 'bg': [None], 'jomp': [t.jomp],
                 'omp': [t.omp], 'spread': [None], 'scmp': [None]}
        packed = pp.decode_packed_limbs(preds)

        poses, scores, counts = group_skeletons(
            packed, sk_pairs, cfg, n_keypoints=17, capacity=cfg.capacity)
        ours = np.asarray(poses[0])[:int(np.asarray(counts[0]))]

        sp, ss = group_skeletons_strict(
            np.asarray(packed[0], np.float64), sk_pairs,
            person_thre=cfg.person_thre, sort_dim=cfg.sort_dim,
            dist_max=cfg.dist_max, use_scale=cfg.use_scale, n_keypoints=17,
            max_poses=cfg.max_poses)

        for key, valid in (('ours', ours), ('strict', sp)):
            inv = T.annotations_inverse(
                np.asarray(valid, np.float32), meta)
            results[key].extend(poses_to_coco_results(inv, img_id))

    return {k: evaluate_coco_keypoints(coco, v, skeleton.sigmas)
            for k, v in results.items()}


@pytest.fixture(scope='module')
def hard_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp('hard_synth_ab')
    return make_hard_dataset(str(root), n_images=8, seed=0, paint=False)


def test_refinements_ap_effect(hard_ds):
    img_dir, ann_file = hard_ds
    stats = run_ab(img_dir, ann_file)
    ours, strict = stats['ours']['AP'], stats['strict']['AP']
    print(f"\nA/B AP on 8-image hard subset: ours={ours:.4f} "
          f"strict-reference={strict:.4f} delta={ours - strict:+.4f}")
    # the refinements must never LOSE meaningful AP vs reference semantics
    assert ours >= strict - 0.005, (ours, strict)


if __name__ == '__main__':
    import argparse
    import tempfile
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--n-images', type=int, default=100)
    p.add_argument('--seed', type=int, default=0)
    a = p.parse_args()
    root = tempfile.mkdtemp(prefix='hard_ab_')
    img_dir, ann_file = make_hard_dataset(root, a.n_images, a.seed,
                                          paint=False)
    stats = run_ab(img_dir, ann_file)
    for k, s in stats.items():
        print(k, {m: round(v, 4) for m, v in s.items()
                  if m in ('AP', 'AP50', 'AP75', 'APm', 'APl')})
