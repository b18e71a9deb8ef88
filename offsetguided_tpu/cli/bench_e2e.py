#!/usr/bin/env python
"""From-disk end-to-end evaluation throughput on the hard synthetic benchmark.

Unlike bench.py (device-only: pre-staged tensors), this measures the WHOLE
harness the way a user runs it: JPEG decode -> rescale/pad -> device forward
(+optional flip-test) -> on-device decode -> inverse transform -> COCO
records, with `--io-workers` host threads feeding the device loop
(eval/harness.py::run_images). Reference hot loop: evaluate.py:171-182,
207-298 (DataLoader workers + GPU forward + multiprocessing decode).

Outputs one JSON line per configuration.
"""
import argparse
import json
import os
import sys
import time



def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data-root', default='/tmp/ogtpu_hardbench',
                   help='hard-synthetic dataset location (generated if absent)')
    p.add_argument('--n-images', type=int, default=100)
    p.add_argument('--long-edge', type=int, default=640)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--io-workers', type=int, default=4)
    p.add_argument('--modes', default='noflip,flip',
                   help='comma list from {noflip, flip}')
    p.add_argument('--fixed-height', action='store_true',
                   help='benchmark the fixed-height eval mode (the '
                        "reference's best test-dev config, evaluate.py:"
                        '141-154 / README.md:117-131): height rescaled to '
                        '--long-edge, batch 1, width padded to '
                        '--width-bucket multiples; also reports the number '
                        'of distinct compiled programs over the image set')
    p.add_argument('--width-bucket', type=int, default=256,
                   help='fixed-height width padding bucket (multiple of '
                        'max stride 128); smaller buckets = less padding '
                        'waste but more distinct compiled programs')
    p.add_argument('--debug-tiny-model', action='store_true')
    p.add_argument('--no-cache', action='store_true')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    if not args.no_cache and jax.default_backend() != 'cpu':
        from offsetguided_tpu.utils.cache import enable_persistent_cache
        enable_persistent_cache('/tmp/jax_bench_cache')

    from offsetguided_tpu.config.defaults import (DecoderConfig, EvalConfig,
                                                  HeadsConfig, ModelConfig,
                                                  SkeletonConfig)
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.data.synthetic import make_hard_dataset
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.harness import run_images
    from offsetguided_tpu.models import PoseNet

    ann_file = os.path.join(args.data_root, 'annotations.json')
    img_dir = os.path.join(args.data_root, 'images')
    if not os.path.exists(ann_file):
        img_dir, ann_file = make_hard_dataset(args.data_root, args.n_images)

    skeleton = SkeletonConfig()
    if args.debug_tiny_model:
        model_cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                                modules=(1, 1, 1), cnv_dim=8,
                                compute_dtype='float32', heads=HeadsConfig())
    else:
        model_cfg = ModelConfig()
    model = PoseNet(model_cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    pp = PostProcessor(cfg=DecoderConfig(topk=32, thre_hmp=0.04,
                                         dist_max=40.0))
    coco = CocoJson(ann_file)
    ids = coco.image_ids(with_persons=True)[:args.n_images]

    for mode in args.modes.split(','):
        flip = mode.strip() == 'flip'
        cfg = EvalConfig(long_edge=args.long_edge, flip_test=flip,
                         batch_size=args.batch_size,
                         io_workers=args.io_workers,
                         fixed_height=args.fixed_height,
                         width_bucket=args.width_bucket)
        extra = {}
        if args.fixed_height:
            # every distinct padded (H, W) is one XLA compilation; derive
            # the set from the annotation-file sizes without decoding pixels
            from ..eval.harness import preprocess_eval
            import numpy as np
            shapes = set()
            for i in ids:
                info = coco.image_info(i)
                dummy = np.zeros((info['height'], info['width'], 3),
                                 np.uint8)
                fimg, _a, _m = preprocess_eval(
                    dummy, np.zeros((0, skeleton.n_keypoints, 4),
                                    np.float32),
                    cfg, skeleton.n_keypoints, normalize=False)
                shapes.add(fimg.shape[:2])
            extra = {'n_compiled_programs': len(shapes),
                     'shapes': sorted(list(map(list, shapes))),
                     'width_bucket': args.width_bucket}
        # cold pass: compiles every distinct program (fixed-height: one per
        # padded shape) and fills the OS page cache; timed separately so the
        # compile-count tradeoff of the bucket size is visible
        t0 = time.perf_counter()
        run_images(model, variables, pp, coco, img_dir, cfg,
                   n_images=args.n_images, skeleton=skeleton)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        results = run_images(model, variables, pp, coco, img_dir, cfg,
                             n_images=args.n_images, skeleton=skeleton)
        dt = time.perf_counter() - t0
        print(json.dumps({
            'metric': (f'fromdisk_fps_{"fh" if args.fixed_height else ""}'
                       f'{args.long_edge}{"_flip" if flip else ""}'),
            'value': round(len(ids) / dt, 2),
            'unit': 'img/s',
            'cold_pass_s': round(cold, 1),
            'n_images': len(ids),
            'n_results': len(results),
            'io_workers': args.io_workers,
            'batch_size': args.batch_size,
            **extra,
        }))


if __name__ == '__main__':
    main()
