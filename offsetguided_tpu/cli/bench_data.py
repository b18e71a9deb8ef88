#!/usr/bin/env python
"""Data pipeline throughput: host augmentation + on-device GT encoding.

Reference baseline: ~70-80 samples/s for the full aug+encode pipeline on one
process (reference data/factory.py:236). Here augmentation runs on host (cv2)
while Gaussian/offset GT rendering is batched on device, so the two are
measured separately and as a pipelined whole.
"""
import argparse
import os
import sys
import time


import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--image-dir', required=True)
    p.add_argument('--annotation-file', required=True)
    p.add_argument('--square-length', type=int, default=512)
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--n-batches', type=int, default=20)
    p.add_argument('--num-workers', type=int, default=0,
                   help='augmentation worker processes (0 = thread)')
    p.add_argument('--device-aug', action='store_true',
                   help='measure the device-aug host path (JPEG decode + '
                        'mask render + parameter sampling only; warp runs '
                        'on device, ops/augment.py)')
    p.add_argument('--raw-canvas', type=int, default=640)
    args = p.parse_args()

    from offsetguided_tpu.config import COCO_PERSON_SKELETON
    from offsetguided_tpu.config.defaults import (AugmentationConfig,
                                                  EncoderConfig,
                                                  SkeletonConfig)
    from offsetguided_tpu.data import CocoKeypoints, batch_iterator
    from offsetguided_tpu.ops.encoder import downscale_mask, encode_targets

    skeleton = SkeletonConfig()
    enc = EncoderConfig()
    ds = CocoKeypoints(args.image_dir, args.annotation_file,
                       skeleton=skeleton,
                       aug=AugmentationConfig(
                           square_length=args.square_length),
                       square_length=args.square_length,
                       device_aug=args.device_aug,
                       raw_canvas=args.raw_canvas)
    out_hw = args.square_length // enc.stride
    sigmas = np.asarray(skeleton.sigmas)

    if args.device_aug:
        from offsetguided_tpu.ops.augment import augment_batch_dict

        @jax.jit
        def aug_encode(b):
            imgs, mask01, anns2 = augment_batch_dict(
                b, args.square_length, ds.left_index, ds.right_index)
            t = encode_targets(anns2, sigmas, COCO_PERSON_SKELETON,
                               out_hw, out_hw, enc)
            # imgs RETURNED so the warp is in the measured program (a
            # discarded output would be dead-code-eliminated at lowering)
            return imgs, t, downscale_mask(mask01, enc)

    @jax.jit
    def encode(anns, mask):
        t = encode_targets(anns, sigmas, COCO_PERSON_SKELETON, out_hw, out_hw,
                           enc)
        return t, downscale_mask(mask, enc)

    n = 0
    t_host = 0.0
    t0 = time.perf_counter()
    last = t0
    for i, batch in enumerate(batch_iterator(ds, args.batch_size, epochs=None,
                                             num_workers=args.num_workers)):
        t_host += time.perf_counter() - last
        if args.device_aug:
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k not in ('metas', 'epoch')}
            imgs, targets, mask = aug_encode(dev)
        else:
            targets, mask = encode(jnp.asarray(batch['anns']),
                                   jnp.asarray(batch['mask_miss']))
        n += args.batch_size
        if i + 1 >= args.n_batches:
            jax.block_until_ready(targets.hmp)
            break
        last = time.perf_counter()
    total = time.perf_counter() - t0
    print(f'host aug+IO: {n / t_host:.1f} samples/s '
          f'(reference single-process baseline: ~70-80)')
    print(f'pipelined aug + on-device encode: {n / total:.1f} samples/s')


if __name__ == '__main__':
    main()
