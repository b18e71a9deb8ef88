#!/usr/bin/env python
"""Device-augmentation warp micro-benchmark: patch-gather vs tiled matmul.

Times `ops/augment.py`'s two bicubic affine formulations on device-resident
data (no loader, no transfer), at the production device-aug shape
(batch x raw-canvas -> square, RGB+mask packed to 4 channels) — the
isolation the VERDICT round-4 item 2 asks for. The behavior replaced is the
reference's host-side cv2.warpAffine INTER_CUBIC
(/root/reference/transforms/affine.py:138-142).

Prints seconds/batch for each impl and the full `augment_batch`
(warp + photometric + annotation transform) under both.
"""
import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--raw-canvas', type=int, default=640)
    p.add_argument('--square-length', type=int, default=512)
    p.add_argument('--slope-bound', type=float, default=3.0)
    p.add_argument('--lane-chunk', type=int, default=64)
    p.add_argument('--row-tile', type=int, default=8)
    p.add_argument('--impls', default='patch,tiled')
    p.add_argument('--full', action='store_true',
                   help='also time augment_batch (warp+photometric+anns)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from offsetguided_tpu.config.defaults import SkeletonConfig
    from offsetguided_tpu.data.transforms import PAD_RGB
    from offsetguided_tpu.ops.augment import (affine_sample,
                                              affine_sample_tiled,
                                              augment_batch)
    from offsetguided_tpu.utils.profiling import device_time

    rng = np.random.RandomState(0)
    n, c0, s = args.batch_size, args.raw_canvas, args.square_length
    imgs = jnp.asarray(rng.randint(0, 256, (n, c0, c0, 4), dtype=np.uint8))
    # production-like inverse matrices: rotate<=45deg, scale in [0.5, 2]
    mats = []
    for _ in range(n):
        th = rng.uniform(-np.pi / 4, np.pi / 4)
        sc = rng.uniform(0.5, 2.0)
        f = rng.uniform(0.95, 1.05)
        fwd = np.array([[np.cos(th) * sc * f, -np.sin(th) * sc],
                        [np.sin(th) * sc * f, np.cos(th) * sc]])
        inv = np.linalg.inv(fwd)
        t = rng.uniform(-40, 40, 2)
        mats.append(np.hstack([inv, t[:, None]]))
    mats = jnp.asarray(np.stack(mats), jnp.float32)
    valid = jnp.asarray(
        rng.randint(c0 // 2, c0 + 1, (n, 2)), jnp.int32)
    border = tuple(PAD_RGB) + (255.0,)

    impls = args.impls.split(',')
    fns = {}
    if 'patch' in impls:
        fns['patch'] = jax.jit(lambda im, m, v: affine_sample(
            im, m, (s, s), border, v))
    if 'tiled' in impls:
        fns['tiled'] = jax.jit(lambda im, m, v: affine_sample_tiled(
            im, m, (s, s), border, v, slope_bound=args.slope_bound,
            row_tile=args.row_tile, lane_chunk=args.lane_chunk))

    outs = {}
    for name, fn in fns.items():
        outs[name] = np.asarray(fn(imgs, mats, valid))
        dt = device_time(fn, imgs, mats, valid)
        print(f'warp[{name}]: {dt * 1e3:.1f} ms/batch '
              f'({n * s * s / dt / 1e6:.1f} Mpix/s)')
    if len(outs) == 2:
        d = np.abs(outs['patch'] - outs['tiled'])
        print(f'  |patch - tiled|: max {d.max():.4f} mean {d.mean():.6f}')

    if args.full:
        sk = SkeletonConfig()
        left = [i for i, nm in enumerate(sk.keypoints)
                if nm.startswith('left')]
        right = [i for i, nm in enumerate(sk.keypoints)
                 if nm.startswith('right')]
        anns = jnp.asarray(rng.rand(n, 8, sk.n_keypoints, 4), jnp.float32)
        fmats = jnp.asarray(rng.rand(n, 3, 3), jnp.float32)
        sxy = jnp.ones((n, 2), jnp.float32)
        flips = jnp.zeros((n,), bool)
        grays = jnp.zeros((n,), bool)
        tints = jnp.asarray(rng.rand(n, 4), jnp.float32)
        for name in impls:
            fn = jax.jit(lambda im, mi: augment_batch(
                im[..., :3], im[..., 3], anns, fmats, mi, sxy, flips,
                grays, tints, valid, s, left, right, warp_impl=name,
                slope_bound=args.slope_bound))
            dt = device_time(fn, imgs, mats)
            print(f'augment_batch[{name}]: {dt * 1e3:.1f} ms/batch')


if __name__ == '__main__':
    main()
