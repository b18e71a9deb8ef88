#!/usr/bin/env python
"""Oracle simulation: feed ground-truth encoder output straight into the
decoder and run full COCO evaluation -- measures the AP ceiling of the
encode/decode scheme without any network (reference utils/simulate.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    p.add_argument('--dist-max', type=float, default=40.0)
    p.add_argument('--lowres-decode', action='store_true')
    return p.parse_args()


def main():
    args = cli()
    from offsetguided_tpu.config.defaults import (DecoderConfig, EncoderConfig,
                                                  EvalConfig, SkeletonConfig)
    from offsetguided_tpu.data import transforms as T
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.cocoeval import evaluate_coco_keypoints
    from offsetguided_tpu.eval.harness import poses_to_coco_results
    from offsetguided_tpu.ops.encoder import encode_targets

    skeleton = SkeletonConfig()
    enc_cfg = EncoderConfig(max_persons=48)
    eval_cfg = EvalConfig(long_edge=args.long_edge, flip_test=False,
                          batch_size=1)
    pp = PostProcessor(skeleton=skeleton, cfg=DecoderConfig(
        topk=args.topk, thre_hmp=0.1, dist_max=args.dist_max,
        use_scale=False, person_thre=0.1,
        upsampled_decode=not args.lowres_decode))
    coco = CocoJson(args.annotation_file)
    sigmas = np.asarray(skeleton.sigmas)
    size = args.long_edge

    @jax.jit
    def oracle_decode(anns):
        t = encode_targets(anns, sigmas, skeleton.skeleton,
                           size // enc_cfg.stride, size // enc_cfg.stride,
                           enc_cfg)
        preds = {'hmp': [t.hmp], 'bg': [None], 'jomp': [t.jomp],
                 'omp': [t.omp], 'spread': [None], 'scmp': [None]}
        return pp._decode_body(preds, flip_test=False)

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
        poses, scores, counts = oracle_decode(jnp.asarray(padded))
        valid = np.asarray(poses[0])[:int(counts[0])]
        inv = T.annotations_inverse(valid, meta)
        results.extend(poses_to_coco_results(inv, img_id))
        if idx % 100 == 0:
            print(f'simulate {idx}/{len(ids)}')

    stats = evaluate_coco_keypoints(coco, results, skeleton.sigmas)
    print('--- oracle (GT -> decoder) COCO metrics ---')
    for k, v in stats.items():
        print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
