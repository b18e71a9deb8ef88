#!/usr/bin/env python
"""COCO keypoint evaluation entry point (reference evaluate.py equivalent).

Loads an orbax (or converted PyTorch) checkpoint, runs single-scale or
flip-test inference with the fully on-device decoder, and reports OKS AP.
"""
import argparse
import json
import os
import sys


import jax
import jax.numpy as jnp


def cli(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--image-dir', required=True)
    p.add_argument('--annotation-file', required=True)
    p.add_argument('--checkpoint', default=None,
                   help='orbax checkpoint path')
    p.add_argument('--torch-checkpoint', default=None,
                   help='reference .pth checkpoint to convert and evaluate')
    p.add_argument('--long-edge', type=int, default=640)
    p.add_argument('--fixed-height', action='store_true')
    p.add_argument('--flip-test', action='store_true')
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--n-images', type=int, default=None)
    p.add_argument('--topk', type=int, default=32)
    p.add_argument('--thre-hmp', type=float, default=0.04)
    p.add_argument('--dist-max', type=float, default=40.0)
    p.add_argument('--person-thre', type=float, default=0.06)
    p.add_argument('--lowres-decode', action='store_true',
                   help='decode at stride resolution (fast path)')
    p.add_argument('--feat-stage', type=int, default=-1,
                   help="which stack's predictions to decode")
    p.add_argument('--min-len', type=float, default=0.5)
    p.add_argument('--sort-dim', type=int, default=2, choices=[2, 4],
                   help='pose ranking: 2=keypoint score, 4=limb score')
    p.add_argument('--resize-mode', default='bicubic',
                   choices=['bicubic', 'bilinear'])
    p.add_argument('--no-jitter-refine', action='store_true',
                   help='disable jitter-offset coordinate refinement')
    p.add_argument('--no-scale', action='store_true',
                   help='ignore inferred keypoint scales in the dist gate')
    p.add_argument('--max-stride', type=int, default=128)
    p.add_argument('--width-bucket', type=int, default=256,
                   help='fixed-height mode: width padding bucket')
    p.add_argument('--scored-offset', action='store_true',
                   help='heatmap-weighted offset refinement before limb '
                        'collection (reference decoder/factory.py:70-72)')
    p.add_argument('--cat-flip-offset', action='store_true',
                   help='flip-test: keep both offset vectors and pair by '
                        '4-D distance instead of averaging (reference '
                        '--cat-flip-offset, costs ~0.5 AP there)')
    p.add_argument('--guid-jitter-refine', action='store_true',
                   help='refine regressed guiding endpoints with the jitter '
                        'offset before pairing (reference collect.py:158-165)')
    p.add_argument('--peaks-map-batch', type=int, default=6,
                   help='heatmap channels per fused-peaks grid step (>1 '
                        'batches the top-k loop across channels; identical '
                        'results, TPU perf knob; 6 measured best on v5e)')
    p.add_argument('--io-workers', type=int, default=4,
                   help='host IO/preprocess threads feeding the device loop')
    p.add_argument('--dataset', default='coco', choices=['coco', 'crowdpose'])
    p.add_argument('--all-images', action='store_true',
                   help='include images without annotations (test-dev)')
    p.add_argument('--results-json', default=None)
    p.add_argument('--debug-tiny-model', action='store_true',
                   help='narrow random-weight backbone: exercises the full '
                        'eval pipeline quickly (CI / smoke use)')
    p.add_argument('--hg-order', type=int, default=None,
                   help='hourglass recursion depth override (with --dims/'
                        '--modules/--cnv-dim: narrower real-depth variants, '
                        'matching a tools/train.py width-flag run)')
    p.add_argument('--dims', default=None,
                   help='comma-separated per-level channel dims')
    p.add_argument('--modules', default=None,
                   help='comma-separated per-level residual-module counts')
    p.add_argument('--cnv-dim', type=int, default=None)
    p.add_argument('--n-stacks', type=int, default=None)
    args = p.parse_args(argv)
    bucket = max(args.width_bucket, args.max_stride)
    if bucket % args.max_stride != 0:
        p.error(f'--width-bucket ({args.width_bucket}) must be a multiple of '
                f'--max-stride ({args.max_stride})')
    return args


def main(argv=None):
    args = cli(argv)
    from offsetguided_tpu.utils.cache import (
        enable_persistent_cache_if_accelerated)
    enable_persistent_cache_if_accelerated()
    from offsetguided_tpu.config.defaults import (DecoderConfig, EvalConfig,
                                                  ModelConfig, SkeletonConfig)
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval import validation, run_images
    from offsetguided_tpu.eval.cocoeval import evaluate_coco_keypoints
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.models import PoseNet, checkpoint as ckpt

    skeleton = (SkeletonConfig.crowdpose() if args.dataset == 'crowdpose'
                else SkeletonConfig())
    from offsetguided_tpu.config.defaults import HeadsConfig
    heads = HeadsConfig(n_keypoints=skeleton.n_keypoints,
                        n_limbs=skeleton.n_limbs)
    if args.debug_tiny_model:
        model_cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                                modules=(1, 1, 1), cnv_dim=8,
                                compute_dtype='float32', heads=heads)
    else:
        width_kw = {}
        if args.hg_order is not None:
            width_kw['hg_order'] = args.hg_order
        if args.dims is not None:
            width_kw['dims'] = tuple(int(d) for d in args.dims.split(','))
        if args.modules is not None:
            width_kw['modules'] = tuple(int(m)
                                        for m in args.modules.split(','))
        if args.cnv_dim is not None:
            width_kw['cnv_dim'] = args.cnv_dim
        if args.n_stacks is not None:
            width_kw['n_stacks'] = args.n_stacks
        model_cfg = ModelConfig(heads=heads, **width_kw)
    model = PoseNet(model_cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    if args.torch_checkpoint:
        variables, missing = ckpt.load_torch_checkpoint(
            args.torch_checkpoint, variables, model_cfg)
        if missing:
            print(f'[convert] {len(missing)} unmatched entries', missing[:5])
    elif args.checkpoint:
        from offsetguided_tpu.parallel import (create_train_state,
                                               make_optimizer)
        from offsetguided_tpu.config.defaults import TrainConfig
        state = create_train_state(variables, make_optimizer(TrainConfig()))
        state, _, _ = ckpt.load_checkpoint(args.checkpoint, state,
                                           drop_optimizer=True)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    pp = PostProcessor(skeleton=skeleton, cfg=DecoderConfig(
        topk=args.topk, thre_hmp=args.thre_hmp, dist_max=args.dist_max,
        person_thre=args.person_thre, min_len=args.min_len,
        sort_dim=args.sort_dim, resize_mode=args.resize_mode,
        feat_stage=args.feat_stage,
        use_jitter_offset=not args.no_jitter_refine,
        use_scale=not args.no_scale,
        upsampled_decode=not args.lowres_decode,
        scored_offset=args.scored_offset,
        cat_flip_offs=args.cat_flip_offset,
        guid_jitter_refine=args.guid_jitter_refine,
        peaks_map_batch=args.peaks_map_batch))
    eval_cfg = EvalConfig(long_edge=args.long_edge,
                          fixed_height=args.fixed_height,
                          max_stride=args.max_stride,
                          width_bucket=args.width_bucket,
                          flip_test=args.flip_test,
                          batch_size=args.batch_size,
                          io_workers=args.io_workers)

    coco = CocoJson(args.annotation_file)
    results = run_images(model, variables, pp, coco, args.image_dir, eval_cfg,
                         n_images=args.n_images, skeleton=skeleton,
                         progress=True, all_images=args.all_images)
    if args.results_json:
        with open(args.results_json, 'w') as f:
            json.dump(results, f)
    # metric restricted to the evaluated image set (reference evaluate.py:324
    # sets cocoEval.params.imgIds = validation_ids)
    from offsetguided_tpu.eval.harness import eval_image_ids
    ids = eval_image_ids(coco, n_images=args.n_images,
                         all_images=args.all_images)
    if args.dataset == 'crowdpose':
        # crowd-band protocol: AP plus easy/medium/hard crowdIndex bands
        # (reference README.md:133-150 reports AP/APe/APm/APh)
        from offsetguided_tpu.eval.cocoeval import evaluate_crowdpose_keypoints
        stats = evaluate_crowdpose_keypoints(coco, results, skeleton.sigmas,
                                             image_ids=ids)
    else:
        stats = evaluate_coco_keypoints(coco, results, skeleton.sigmas,
                                        image_ids=ids)
    for k, v in stats.items():
        print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
