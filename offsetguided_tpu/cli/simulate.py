#!/usr/bin/env python
"""Oracle simulation: feed ground-truth encoder output straight into the
decoder and run full COCO evaluation -- measures the AP ceiling of the
encode/decode scheme without any network (reference utils/simulate.py).
"""
import argparse
import os
import sys


import cv2
import jax
import jax.numpy as jnp
import numpy as np


def cli():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--image-dir', required=True)
    p.add_argument('--annotation-file', required=True)
    p.add_argument('--long-edge', type=int, default=640)
    p.add_argument('--n-images', type=int, default=None)
    p.add_argument('--topk', type=int, default=32)
    p.add_argument('--thre-hmp', type=float, default=0.1)
    p.add_argument('--dist-max', type=float, default=40.0)
    p.add_argument('--max-persons', type=int, default=48)
    p.add_argument('--capacity', type=int, default=None,
                   help='grouping intermediate skeleton-row capacity '
                        '(DecoderConfig.capacity; the reference grows its '
                        'subset list unboundedly, group.py:166-177 — sweep '
                        'this on crowd scenes to find the drop-policy knee)')
    p.add_argument('--max-poses', type=int, default=None,
                   help='grouped-output pose capacity (DecoderConfig.max_poses)')
    p.add_argument('--lowres-decode', action='store_true')
    p.add_argument('--pallas', default='auto', choices=['auto', 'on', 'off'],
                   help='decode kernel dispatch (parity comparisons)')
    p.add_argument('--flip-test', action='store_true',
                   help='encode the W-mirrored annotations as the second '
                        'half-batch and decode through the flip-merge path '
                        '(the oracle analogue of evaluate.py flip test)')
    p.add_argument('--scored-offset', action='store_true',
                   help='heatmap-weighted offset refinement before limb '
                        'collection (reference decoder/factory.py:70-72)')
    p.add_argument('--cat-flip-offset', action='store_true',
                   help='flip-test: keep both offset vectors and pair by '
                        '4-D distance instead of averaging (reference '
                        '--cat-flip-offset)')
    p.add_argument('--guid-jitter-refine', action='store_true',
                   help='refine regressed guiding endpoints with the jitter '
                        'offset before pairing (reference collect.py:158-165)')
    return p.parse_args()


def main():
    args = cli()
    from offsetguided_tpu.utils.cache import (
        enable_persistent_cache_if_accelerated)
    enable_persistent_cache_if_accelerated()
    from offsetguided_tpu.config.defaults import (DecoderConfig, EncoderConfig,
                                                  EvalConfig, SkeletonConfig)
    from offsetguided_tpu.data import transforms as T
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.cocoeval import evaluate_coco_keypoints
    from offsetguided_tpu.eval.harness import poses_to_coco_results
    from offsetguided_tpu.ops.encoder import encode_targets

    skeleton = SkeletonConfig()
    enc_cfg = EncoderConfig(max_persons=args.max_persons)
    eval_cfg = EvalConfig(long_edge=args.long_edge, flip_test=False,
                          batch_size=1)
    cap_kw = {}
    if args.capacity is not None:
        cap_kw['capacity'] = args.capacity
    if args.max_poses is not None:
        cap_kw['max_poses'] = args.max_poses
    pp = PostProcessor(skeleton=skeleton, cfg=DecoderConfig(
        topk=args.topk, thre_hmp=args.thre_hmp, dist_max=args.dist_max,
        use_scale=False, person_thre=0.1,
        upsampled_decode=not args.lowres_decode,
        pallas_grouping=args.pallas,
        scored_offset=args.scored_offset,
        cat_flip_offs=args.cat_flip_offset,
        guid_jitter_refine=args.guid_jitter_refine, **cap_kw))
    coco = CocoJson(args.annotation_file)
    sigmas = np.asarray(skeleton.sigmas)
    size = args.long_edge
    kp_flip = np.asarray(skeleton.heatmap_flip_indices())

    def encode(anns):
        t = encode_targets(anns, sigmas, skeleton.skeleton,
                           size // enc_cfg.stride, size // enc_cfg.stride,
                           enc_cfg)
        return {'hmp': [t.hmp], 'bg': [None], 'jomp': [t.jomp],
                'omp': [t.omp], 'spread': [None], 'scmp': [None]}

    @jax.jit
    def oracle_decode(anns):
        return pp._decode_body(encode(anns), flip_test=False)

    @jax.jit
    def oracle_decode_flip(anns, anns_flipped):
        """[original; mirrored] GT -> flip-merged decode: what a perfect
        network would produce under evaluate.py's flip test."""
        a, b = encode(anns), encode(anns_flipped)
        preds = {k: [jnp.concatenate([a[k][0], b[k][0]])
                     if a[k][0] is not None else None] for k in a}
        return pp._decode_body(preds, flip_test=True)

    def mirror_annotations(padded):
        """W-mirror padded (1, P, J, 4) annotations: what the mirrored image's
        GT looks like (x -> size-1-x, L/R keypoint labels swap)."""
        flipped = padded[:, :, kp_flip, :].copy()
        valid = flipped[..., 2] > 0
        flipped[..., 0] = np.where(valid, size - 1 - flipped[..., 0], 0.0)
        return flipped

    results = []
    ids = coco.image_ids(with_persons=True, with_keypoints=True)
    if args.n_images:
        ids = ids[:args.n_images]
    for idx, img_id in enumerate(ids):
        info = coco.image_info(img_id)
        anns = T.normalize_annotations(coco.anns_for_image(img_id),
                                       skeleton.sigmas)
        meta = T.make_meta(info['width'], info['height'])
        dummy = np.zeros((info['height'], info['width'], 3), np.uint8)
        img2, anns, meta = T.rescale_long_absolute(dummy, anns, meta,
                                                   args.long_edge)
        _, anns, meta = T.center_pad(img2, anns, meta, args.long_edge)
        padded = np.zeros((1, enc_cfg.max_persons, skeleton.n_keypoints, 4),
                          np.float32)
        padded[0, :min(len(anns), enc_cfg.max_persons)] = \
            anns[:enc_cfg.max_persons]
        if args.flip_test:
            poses, scores, counts = oracle_decode_flip(
                jnp.asarray(padded), jnp.asarray(mirror_annotations(padded)))
        else:
            poses, scores, counts = oracle_decode(jnp.asarray(padded))
        valid = np.asarray(poses[0])[:int(counts[0])]
        inv = T.annotations_inverse(valid, meta)
        results.extend(poses_to_coco_results(inv, img_id))
        if idx % 100 == 0:
            print(f'simulate {idx}/{len(ids)}')

    stats = evaluate_coco_keypoints(coco, results, skeleton.sigmas,
                                    image_ids=ids)
    print('--- oracle (GT -> decoder) COCO metrics ---')
    for k, v in stats.items():
        print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
