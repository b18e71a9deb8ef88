#!/usr/bin/env python
"""Self-contained correctness check of the full training loop.

Generates a small synthetic COCO dataset (stick figures drawn into the
images), trains a narrow hourglass from scratch, then evaluates with the full
on-device decoder and the OKS AP metric. A healthy stack reaches AP > 0.7
(AP50 = AP75 = 1.0) after ~1200 steps; run time ~20 min on one CPU core,
~1 min on a TPU chip.

This exercises every layer end-to-end: data loading -> augmentation ->
on-device GT encoding -> focal-L2/offset losses -> gradients/optimizer ->
inference -> decode -> grouping -> inverse transforms -> evaluation.
(Measured on CPU: AP 0.753, AP50/AP75 1.0 at 1154 steps.)
"""
import argparse
import json
import os
import pathlib
import sys
import tempfile
import time


import cv2
import numpy as np

TEMPLATE = np.array([
    [0.50, 0.07], [0.46, 0.05], [0.54, 0.05], [0.42, 0.07], [0.58, 0.07],
    [0.36, 0.22], [0.64, 0.22], [0.32, 0.40], [0.68, 0.40], [0.30, 0.57],
    [0.70, 0.57], [0.41, 0.54], [0.59, 0.54], [0.40, 0.75], [0.60, 0.75],
    [0.39, 0.95], [0.61, 0.95]], dtype=np.float32)

DRAW_LIMBS = [(5, 6), (5, 7), (6, 8), (11, 12), (5, 11), (6, 12), (11, 13),
              (12, 14), (13, 15), (14, 16), (7, 9), (8, 10)]


def make_dataset(root: pathlib.Path, n_images: int = 4):
    (root / 'images').mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(3)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        h, w = 256, 320
        img = (rng.rand(h, w, 3) * 80 + 60).astype(np.uint8)
        for p in range(1 + img_id % 2):
            box = 130 + rng.rand() * 60
            x0 = 10 + p * 150 + rng.rand() * 10
            y0 = 10 + rng.rand() * 30
            kps = np.zeros((17, 3), np.float32)
            kps[:, 0] = x0 + TEMPLATE[:, 0] * box + rng.rand(17) * 0.7
            kps[:, 1] = y0 + TEMPLATE[:, 1] * box + rng.rand(17) * 0.7
            kps[:, 2] = 2
            for a, b in DRAW_LIMBS:
                cv2.line(img, tuple(kps[a, :2].astype(int)),
                         tuple(kps[b, :2].astype(int)), (220, 40, 40), 3)
            for j in range(17):
                cv2.circle(img, tuple(kps[j, :2].astype(int)), 4,
                           (40, 220, 40), -1)
                cv2.circle(img, tuple(kps[j, :2].astype(int)), 2,
                           (40 + j * 10, 120, 250 - j * 10), -1)
            bw = kps[:, 0].max() - kps[:, 0].min() + 6
            bh = kps[:, 1].max() - kps[:, 1].min() + 6
            bx, by = kps[:, 0].min() - 3, kps[:, 1].min() - 3
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'keypoints': kps.reshape(-1).tolist(), 'num_keypoints': 17,
                'iscrowd': 0, 'bbox': [float(bx), float(by), float(bw),
                                       float(bh)],
                'area': float(bw * bh * 0.6),
                'segmentation': [[float(bx), float(by), float(bx + bw),
                                  float(by), float(bx + bw), float(by + bh),
                                  float(bx), float(by + bh)]],
            })
            ann_id += 1
        name = f'{img_id:06d}.jpg'
        cv2.imwrite(str(root / 'images' / name), img)
        images.append({'id': img_id, 'file_name': name, 'height': h,
                       'width': w})
    (root / 'annotations.json').write_text(json.dumps(
        {'images': images, 'annotations': annotations,
         'categories': [{'id': 1, 'name': 'person'}]}))
    return str(root / 'images'), str(root / 'annotations.json')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--steps', type=int, default=1500)
    p.add_argument('--time-budget-s', type=float, default=1800)
    p.add_argument('--min-ap', type=float, default=0.5)
    p.add_argument('--device-aug', action='store_true',
                   help='train through the device-side augmentation path '
                        '(ops/augment.py) instead of host cv2')
    p.add_argument('--opt-state-dtype', default='float32',
                   choices=['float32', 'bfloat16'],
                   help='Adam moment-state dtype (convergence-parity gate '
                        'for the bf16 optimizer-state option)')
    p.add_argument('--seed', type=int, default=0,
                   help='model-init + batch-order seed (the dataset itself '
                        'stays fixed so every seed trains the same task); '
                        'multi-seed runs turn the single-draw convergence '
                        'gate into a band')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from offsetguided_tpu.config import (COCO_PERSON_SIGMAS,
                                         COCO_PERSON_SKELETON)
    from offsetguided_tpu.config.defaults import (
        AugmentationConfig, DecoderConfig, EncoderConfig, EvalConfig,
        HeadsConfig, LossConfig, ModelConfig, SkeletonConfig, TrainConfig)
    from offsetguided_tpu.data import CocoKeypoints, batch_iterator
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.cocoeval import evaluate_coco_keypoints
    from offsetguided_tpu.eval.harness import run_images
    from offsetguided_tpu.models import PoseNet
    from offsetguided_tpu.ops.encoder import downscale_mask, encode_targets
    from offsetguided_tpu.parallel import (create_train_state, jit_train_step,
                                           make_optimizer)

    tmp = pathlib.Path(tempfile.mkdtemp(prefix='selfcheck_'))
    img_dir, ann_file = make_dataset(tmp)

    skeleton = SkeletonConfig()
    S = 128
    cfg = ModelConfig(n_stacks=1, hg_order=3, dims=(48, 48, 64, 96),
                      modules=(1, 1, 1, 1), cnv_dim=48,
                      compute_dtype='float32', heads=HeadsConfig())
    model = PoseNet(cfg)
    enc = EncoderConfig(max_persons=8)
    # deterministic training geometry matched to eval (long-edge 128/320)
    aug = AugmentationConfig(square_length=S, flip_prob=0.0, max_rotate=0.0,
                             min_scale=0.4, max_scale=0.4, min_stretch=1.0,
                             max_stretch=1.0, max_translate=0, gray_prob=0.0,
                             color_tint_prob=0.0, annotation_jitter_prob=0.0)
    ds = CocoKeypoints(img_dir, ann_file, skeleton=skeleton, aug=aug,
                       square_length=S, max_persons=8,
                       device_aug=args.device_aug, raw_canvas=320)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, S, S, 3)),
                           train=False)
    loss_cfg = LossConfig(stack_weights=(1.0,), fgamma=2.0,
                          lambdas=(1.0, 0.1, 100.0, 300.0, 1.0))
    tx = make_optimizer(TrainConfig(learning_rate=2e-3,
                                    opt_state_dtype=args.opt_state_dtype))
    state = create_train_state(variables, tx)
    step = jit_train_step(model, tx, loss_cfg)
    sig = np.asarray(COCO_PERSON_SIGMAS)
    out_hw = S // 4

    if args.device_aug:
        from offsetguided_tpu.ops.augment import augment_batch_dict

        @jax.jit
        def _prepare(b):
            imgs, mask01, anns2 = augment_batch_dict(b, S, ds.left_index,
                                                     ds.right_index)
            t = encode_targets(anns2, sig, COCO_PERSON_SKELETON,
                               out_hw, out_hw, enc)
            return imgs, t, downscale_mask(mask01, enc)

        def prepare(batch):
            return _prepare({k: jnp.asarray(v) for k, v in batch.items()
                             if k not in ('metas', 'epoch')})
    else:
        def prepare(batch):
            t = encode_targets(jnp.asarray(batch['anns']), sig,
                               COCO_PERSON_SKELETON, out_hw, out_hw, enc)
            mask = downscale_mask(jnp.asarray(batch['mask_miss']), enc)
            return jnp.asarray(batch['image']), t, mask

    t0 = time.time()
    n = 0
    for batch in batch_iterator(ds, 4, seed=args.seed, shuffle=False,
                                epochs=None):
        imgs, t, mask = prepare(batch)
        state, m = step(state, imgs, t, mask)
        n += 1
        if n % 250 == 0:
            print(f'step {n}: total={float(m["total"]):.3f} '
                  f'hmp={float(m["hmp"]):.4f}', flush=True)
        if n >= args.steps or time.time() - t0 > args.time_budget_s:
            break

    vars2 = {'params': state.params, 'batch_stats': state.batch_stats}
    pp = PostProcessor(cfg=DecoderConfig(topk=8, thre_hmp=0.05, dist_max=25.0,
                                         use_scale=True, person_thre=0.03,
                                         max_poses=8))
    eval_cfg = EvalConfig(long_edge=S, flip_test=False, batch_size=2)
    coco = CocoJson(ann_file)
    results = run_images(model, vars2, pp, coco, img_dir, eval_cfg)
    stats = evaluate_coco_keypoints(coco, results, skeleton.sigmas)
    print('self-check metrics:', {k: round(v, 3) for k, v in stats.items()})
    ok = stats['AP'] >= args.min_ap
    print('SELF-CHECK', 'PASSED' if ok else 'FAILED',
          f'(AP={stats["AP"]:.3f}, threshold {args.min_ap})')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
