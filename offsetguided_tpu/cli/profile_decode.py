"""Decode-path profiling on the TPU: stage-level timings at the benchmark
configuration (640^2, batch 8, topk 32), mirroring the reference's decode
stage instrumentation (demo_batch.py:245-291)."""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


from offsetguided_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('/tmp/jax_bench_cache')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=640)
    ap.add_argument('--topk', type=int, default=32)
    ap.add_argument('--stages', action='store_true')
    args = ap.parse_args()

    from offsetguided_tpu.config.defaults import DecoderConfig, SkeletonConfig
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.ops import decoder as dec
    from offsetguided_tpu.ops.resize import upsample2d_matmul
    from offsetguided_tpu.utils.profiling import device_time

    n, hw = args.batch, args.size // 4
    rng = np.random.RandomState(0)
    # structured maps: a few hundred plausible peaks
    hmp = jnp.asarray(rng.rand(n, hw, hw, 17).astype(np.float32) ** 8)
    omp = jnp.asarray((rng.randn(n, hw, hw, 38) * 10).astype(np.float32))
    jomp = jnp.asarray((rng.randn(n, hw, hw, 2) * 0.5).astype(np.float32))
    scmp = jnp.asarray((rng.rand(n, hw, hw, 17) * 8).astype(np.float32))
    preds = {'hmp': [hmp], 'bg': [None], 'jomp': [jomp], 'omp': [omp],
             'spread': [None], 'scmp': [scmp]}

    cfg = DecoderConfig(topk=args.topk, thre_hmp=0.04, dist_max=40.0)
    pp = PostProcessor(cfg=cfg)

    full = jax.jit(lambda p: pp._decode_body(p, False))
    dt = device_time(full, preds)
    print(f'decode total: {dt*1e3:.2f} ms/batch-{n}')

    if not args.stages:
        return
    sk = SkeletonConfig()
    jf = np.asarray([s[0] for s in sk.skeleton])
    jt = np.asarray([s[1] for s in sk.skeleton])

    up = jax.jit(lambda h: upsample2d_matmul(h, 4, 'bicubic'))
    print(f'  upsample x4 bicubic: {device_time(up, hmp)*1e3:.2f} ms')

    hmp_up = up(hmp)
    nms = jax.jit(lambda h: dec.hmp_nms(h, 3))
    print(f'  nms 640^2:           {device_time(nms, hmp_up)*1e3:.2f} ms')

    nmsed = nms(hmp_up)
    tk = jax.jit(lambda h: dec.topk_channel_blockreduce(
        h, args.topk, use_pallas=True))
    print(f'  blockreduce topk(P): {device_time(tk, nmsed)*1e3:.2f} ms')
    tk2 = jax.jit(lambda h: dec.topk_channel_blockreduce(
        h, args.topk, use_pallas=False))
    print(f'  blockreduce topk(X): {device_time(tk2, nmsed)*1e3:.2f} ms')

    collect = jax.jit(lambda h, o, j, s: dec.pack_limbs(
        dec.collect_limbs_peak_sampled(h, o, jf, jt, cfg, jomps4=j,
                                       scmps4=s, stride=4)))
    print(f'  collect (up+nms+topk+pair): {device_time(collect, hmp, omp, jomp, scmp)*1e3:.2f} ms')

    packed = collect(hmp, omp, jomp, scmp)
    from offsetguided_tpu.ops.pallas.grouping_pallas import group_skeletons_pallas
    grp = jax.jit(lambda p: group_skeletons_pallas(
        p, tuple(zip(jf.tolist(), jt.tolist())), cfg, n_keypoints=17,
        capacity=cfg.capacity))
    print(f'  pallas grouping:     {device_time(grp, packed)*1e3:.2f} ms')


if __name__ == '__main__':
    main()
