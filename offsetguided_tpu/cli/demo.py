#!/usr/bin/env python
"""Image demo: run pose estimation on image files and visualize
(reference demo_batch.py equivalent)."""
import argparse
import os
import sys


import cv2
import jax
import jax.numpy as jnp
import numpy as np


def cli():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('images', nargs='+', help='image paths')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--torch-checkpoint', default=None)
    p.add_argument('--long-edge', type=int, default=640)
    p.add_argument('--flip-test', action='store_true')
    p.add_argument('--output-dir', default='demo_out')
    p.add_argument('--show-heatmaps', action='store_true')
    p.add_argument('--show-hmp-idx', type=int, default=None,
                   help='overlay one heatmap channel instead of the '
                        'channel max (reference demo_batch --show-hmp-idx)')
    p.add_argument('--show-limb-offsets', type=int, default=None,
                   help='limb index to quiver-plot')
    p.add_argument('--show-all-limbs', action='store_true',
                   help='plot every candidate limb above --limb-thre '
                        '(reference demo_batch.py:241-304)')
    p.add_argument('--limb-thre', type=float, default=0.1)
    p.add_argument('--annotation-file', default=None,
                   help='COCO annotations: also report per-head losses '
                        'against GT (reference demo_batch.py computes val '
                        'losses)')
    p.add_argument('--scored-offset', action='store_true',
                   help='heatmap-weighted offset refinement before limb '
                        'collection (reference decoder/factory.py:70-72)')
    return p.parse_args()


def main():
    args = cli()
    from offsetguided_tpu.utils.cache import (
        enable_persistent_cache_if_accelerated)
    enable_persistent_cache_if_accelerated()
    from offsetguided_tpu.config.defaults import (DecoderConfig, EvalConfig,
                                                  ModelConfig, SkeletonConfig)
    from offsetguided_tpu.data import transforms as T
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.harness import preprocess_eval
    from offsetguided_tpu.models import PoseNet, checkpoint as ckpt
    from offsetguided_tpu.visualization import (KeypointPainter,
                                                draw_limb_offset,
                                                heatmap_overlay, image_canvas)

    skeleton = SkeletonConfig()
    model_cfg = ModelConfig()
    model = PoseNet(model_cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    if args.torch_checkpoint:
        variables, _ = ckpt.load_torch_checkpoint(args.torch_checkpoint,
                                                  variables, model_cfg)
    elif args.checkpoint:
        from offsetguided_tpu.parallel import create_train_state, make_optimizer
        from offsetguided_tpu.config.defaults import TrainConfig
        state = create_train_state(variables, make_optimizer(TrainConfig()))
        state, _, _ = ckpt.load_checkpoint(args.checkpoint, state,
                                           drop_optimizer=True)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    pp = PostProcessor(skeleton=skeleton,
                       cfg=DecoderConfig(scored_offset=args.scored_offset))
    eval_cfg = EvalConfig(long_edge=args.long_edge, flip_test=args.flip_test,
                          batch_size=1)
    os.makedirs(args.output_dir, exist_ok=True)
    painter = KeypointPainter(skeleton_cfg=skeleton)

    @jax.jit
    def infer(images):
        if args.flip_test:
            images = jnp.concatenate([images, jnp.flip(images, axis=2)], 0)
        preds = model.apply(variables, images, train=False)
        return preds, pp._decode_body(preds, flip_test=args.flip_test)

    coco = None
    if args.annotation_file:
        from offsetguided_tpu.data.coco import CocoJson
        coco = CocoJson(args.annotation_file)
        name_to_id = {coco.image_info(i)['file_name']: i
                      for i in coco.image_ids()}

    for path in args.images:
        raw = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        gt_anns = np.zeros((0, 17, 4), np.float32)
        if coco is not None:
            img_id = name_to_id.get(os.path.basename(path))
            if img_id is not None:
                gt_anns = T.normalize_annotations(
                    coco.anns_for_image(img_id), skeleton.sigmas)
        img, anns_s, meta = preprocess_eval(raw, gt_anns, eval_cfg)
        preds, (poses, scores, counts) = infer(jnp.asarray(img[None]))
        n = int(counts[0])
        valid_rows = np.asarray(poses[0])[:n]
        inv = T.annotations_inverse(valid_rows, meta)

        if coco is not None and len(anns_s):
            # per-head losses vs GT (reference demo_batch computes val losses)
            from offsetguided_tpu.config.defaults import (EncoderConfig,
                                                          LossConfig)
            from offsetguided_tpu.ops.encoder import encode_targets
            from offsetguided_tpu.ops.losses import compute_losses
            enc = EncoderConfig(max_persons=32)
            padded = np.zeros((1, enc.max_persons, 17, 4), np.float32)
            padded[0, :min(len(anns_s), enc.max_persons)] = \
                anns_s[:enc.max_persons]
            hw = img.shape[0] // enc.stride, img.shape[1] // enc.stride
            t = encode_targets(jnp.asarray(padded),
                               np.asarray(skeleton.sigmas),
                               skeleton.skeleton, hw[0], hw[1], enc)
            mask = jnp.ones((1, hw[0], hw[1], 1), bool)
            single = {k: [v[-1][:1] if v[-1] is not None else None]
                      for k, v in preds.items()}
            losses = compute_losses(single, t, mask,
                                    LossConfig(stack_weights=(1.0,)))
            print('  losses:', {k: round(float(v), 5)
                                for k, v in losses.items()})
        base = os.path.join(args.output_dir,
                            os.path.splitext(os.path.basename(path))[0])
        with image_canvas(raw, base + '.poses.png') as ax:
            painter.keypoints(ax, inv, scores=np.asarray(scores[0]))
        print(f'{path}: {n} poses -> {base}.poses.png')
        if args.show_heatmaps or args.show_hmp_idx is not None:
            with image_canvas(img * 0.5 + 0.5, base + '.hmp.png') as ax:
                heatmap_overlay(ax, img * 0.2 + 0.5,
                                np.asarray(preds['hmp'][-1][0]),
                                channel=args.show_hmp_idx)
        if args.show_limb_offsets is not None:
            with image_canvas(img * 0.5 + 0.5, base + '.omp.png') as ax:
                draw_limb_offset(ax, np.asarray(preds['omp'][-1][0]),
                                 args.show_limb_offsets)
        if args.show_all_limbs:
            from offsetguided_tpu.ops import decoder as dec_ops
            from offsetguided_tpu.ops.resize import upsample2d_matmul
            jf = np.asarray(pp._jf)
            jt = np.asarray(pp._jt)
            maps = pp.select_stage(preds)
            hmp_up = upsample2d_matmul(maps['hmp'][:1], pp.cfg.stride,
                                       pp.cfg.resize_mode)
            limbs = dec_ops.collect_limbs_peak_sampled(
                hmp_up, maps['omp'][:1], jf, jt, pp.cfg,
                jomps4=maps['jomp'][:1] if maps['jomp'] is not None else None,
                scmps4=maps['scmp'][:1] if maps['scmp'] is not None else None)
            packed = np.asarray(dec_ops.pack_limbs(limbs))[0]  # (L, K, 13)
            with image_canvas(img * 0.5 + 0.5, base + '.limbs.png') as ax:
                for l in range(packed.shape[0]):
                    for k in range(packed.shape[1]):
                        x1, y1, _, x2, y2, _ = packed[l, k, :6]
                        score = packed[l, k, 10]
                        if score < args.limb_thre or x1 < 0 or x2 < 0:
                            continue
                        ax.plot([x1, x2], [y1, y2], '-', linewidth=1,
                                alpha=min(1.0, 0.2 + score),
                                color='lime')


if __name__ == '__main__':
    main()
