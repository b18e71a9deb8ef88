#!/usr/bin/env python
"""Data-parallel training entry point (reference train_dist.py equivalent).

Single-program SPMD over a jax.sharding.Mesh: the host feeds globally-sharded
batches, the jitted step computes bf16 forward/backward with global BatchNorm
statistics and mean gradients (XLA inserts the collectives), optax updates,
orbax checkpoints once per epoch. Multi-host: run one process per host with
`jax.distributed.initialize` (--distributed).
"""
import argparse
import logging
import os
import sys
import time


import jax
import jax.numpy as jnp
import numpy as np


def cli(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    g = p.add_argument_group('data')
    g.add_argument('--train-image-dir', required=True)
    g.add_argument('--train-annotations', required=True)
    g.add_argument('--val-image-dir', default=None)
    g.add_argument('--val-annotations', default=None)
    g.add_argument('--square-length', type=int, default=512)
    g.add_argument('--max-persons', type=int, default=32)
    g.add_argument('--n-images', type=int, default=None)
    g.add_argument('--warp-impl', default='tiled',
                   choices=['patch', 'tiled'],
                   help='device-aug bicubic warp formulation: tiled = '
                        'windowed banded matmuls (default; 3.4x the gather '
                        'path on v5e, ops/augment.py::affine_sample_tiled); '
                        'patch = 4x4 patch lax.gather')
    g.add_argument('--device-aug', action='store_true',
                   help='run warp-affine + photometric augmentation inside '
                        'the jitted train program (ops/augment.py): the '
                        'host keeps only JPEG decode, mask render, and '
                        'parameter sampling — removes the host cv2 aug '
                        'bottleneck on TPU hosts')
    g.add_argument('--raw-canvas', type=int, default=640,
                   help='device-aug: fixed raw-image canvas side (largest '
                        'source image side; COCO is 640)')

    g = p.add_argument_group('augmentation',
                             description='warp-affine/photometric bounds '
                                         '(reference data/factory.py:64-106)')
    g.add_argument('--flip-prob', type=float, default=0.5)
    g.add_argument('--max-rotate', type=float, default=45.0)
    g.add_argument('--min-scale', type=float, default=0.5)
    g.add_argument('--max-scale', type=float, default=2.0)
    g.add_argument('--min-stretch', type=float, default=0.95)
    g.add_argument('--max-stretch', type=float, default=1.05)
    g.add_argument('--max-translate', type=int, default=150)

    g = p.add_argument_group('encoder')
    g.add_argument('--sigma', type=float, default=7.0)
    g.add_argument('--gaussian-clip', type=float, default=0.01)
    g.add_argument('--fill-jitter-size', type=int, default=3)
    g.add_argument('--fill-scale-size', type=int, default=7)

    g = p.add_argument_group('model')
    g.add_argument('--basenet', default='hourglass104',
                   choices=['hourglass104', 'hourglass52', 'hourglass4stage'])
    g.add_argument('--n-stacks', type=int, default=2)
    g.add_argument('--no-background', action='store_true')
    g.add_argument('--no-jitter-offset', action='store_true')
    g.add_argument('--no-scale', action='store_true')
    g.add_argument('--n-limbs', type=int, default=19,
                   choices=[16, 19, 25, 31, 44])
    g.add_argument('--dataset', default='coco', choices=['coco', 'crowdpose'])
    g.add_argument('--hg-order', type=int, default=None,
                   help='hourglass recursion depth (default: ModelConfig '
                        'full-width 5); with --dims/--modules/--cnv-dim '
                        'builds narrower real-depth variants, e.g. the '
                        'composed-A/B mid-width config')
    g.add_argument('--dims', default=None,
                   help='comma-separated per-level channel dims '
                        '(len = hg_order + 1)')
    g.add_argument('--modules', default=None,
                   help='comma-separated per-level residual-module counts')
    g.add_argument('--cnv-dim', type=int, default=None,
                   help='post-hourglass conv width')
    g.add_argument('--remat', action='store_true',
                   help='rematerialize each hourglass stack in the backward '
                        '(jax.checkpoint): ~n_stacks x less activation HBM '
                        'for ~1 extra forward per stack; enables larger '
                        'per-chip batches')

    g = p.add_argument_group('optimization')
    g.add_argument('--optimizer', default='adam', choices=['adam', 'sgd'])
    g.add_argument('--opt-state-dtype', default='float32',
                   choices=['float32', 'bfloat16'],
                   help='Adam moment-state storage dtype; bfloat16 halves '
                        'the optimizer HBM footprint and per-step traffic '
                        '(update math stays fp32)')
    g.add_argument('--lr', type=float, default=1.25e-4)
    g.add_argument('--momentum', type=float, default=0.9)
    g.add_argument('--weight-decay', type=float, default=0.0)
    g.add_argument('--max-grad-norm', type=float, default=None,
                   help='global-norm gradient clipping (reference '
                        '--max-grad-norm)')
    g.add_argument('--epochs', type=int, default=120)
    g.add_argument('--batch-size', type=int, default=16,
                   help='global batch size over all devices')
    g.add_argument('--warmup-epochs', type=int, default=0)
    g.add_argument('--freeze', default=None,
                   help='regex of parameter paths to freeze')

    g = p.add_argument_group('losses',
                             description='selection + weighting (reference '
                                         'models/losses.py, factory.py:52-55)')
    g.add_argument('--hmp-loss', default='focal_l2',
                   choices=['l2', 'focal_l2'])
    g.add_argument('--offset-loss', default='offset_instance_l1',
                   choices=['offset_l1', 'offset_instance_l1',
                            'offset_laplace'])
    g.add_argument('--jitter-offset-loss', default='offset_l1',
                   choices=['offset_l1', 'offset_instance_l1',
                            'offset_laplace'])
    g.add_argument('--scale-loss', default='scale_l1', choices=['scale_l1'])
    g.add_argument('--sqrt-re', dest='sqrt_re', action='store_true',
                   default=True)
    g.add_argument('--no-sqrt-re', dest='sqrt_re', action='store_false')
    g.add_argument('--ftao', type=float, default=0.01,
                   help='focal-L2 fore/background threshold (TAU)')
    g.add_argument('--fgamma', type=float, default=2.0)
    g.add_argument('--lmargin', type=float, default=1e-5,
                   help='offset-loss element margin (MARGIN)')
    g.add_argument('--scale-margin', type=float, default=0.1,
                   help='scale-loss margin (MARGIN2)')
    g.add_argument('--lambdas', type=float, nargs=5,
                   default=[1.0, 0.0, 0.0, 10000.0, 10.0])
    g.add_argument('--stack-weights', type=float, nargs='+', default=None)

    g = p.add_argument_group('runtime')
    g.add_argument('--checkpoint-dir', default='checkpoints')
    g.add_argument('--resume', default=None)
    g.add_argument('--torch-checkpoint', default=None,
                   help='warm-start from a reference .pth (full network or '
                        'backbone-only pretrain; reference README.md:160 '
                        '--basenet-checkpoint / --checkpoint-whole)')
    g.add_argument('--drop-optim-state', action='store_true')
    g.add_argument('--recount-epoch', action='store_true')
    g.add_argument('--drop-layers', default=None)
    g.add_argument('--print-freq', type=int, default=20)
    g.add_argument('--log-file', default=None)
    g.add_argument('--save-every', type=int, default=1,
                   help='checkpoint every N epochs (the reference saves '
                        'every epoch, train_dist.py:214; on small datasets '
                        'an epoch is seconds and the save dominates — raise '
                        'this to amortize; the final checkpoint is always '
                        'written)')
    g.add_argument('--distributed', action='store_true',
                   help='multi-host: call jax.distributed.initialize()')
    g.add_argument('--coordinator-address', default=None,
                   help='host:port of process 0 (omit for auto-detection '
                        'via the cluster environment)')
    g.add_argument('--num-processes', type=int, default=None)
    g.add_argument('--process-id', type=int, default=None)
    g.add_argument('--seed', type=int, default=0)
    g.add_argument('--loader-workers', type=int, default=0,
                   help='augmentation worker processes (0 = one background '
                        'thread); reference DataLoader num_workers '
                        '(data/factory.py:109-156)')
    g.add_argument('--debug-tiny-model', action='store_true',
                   help='swap in a narrow backbone (CI smoke tests)')
    g.add_argument('--max-steps', type=int, default=None,
                   help='stop after this many optimizer steps')
    return p.parse_args(argv)


def main(argv=None):
    args = cli(argv)
    # long tunneled compiles look like hangs: SIGQUIT dumps all python
    # stacks instead of silently terminating (debuggability for remote runs)
    try:
        import faulthandler
        import signal
        faulthandler.register(signal.SIGQUIT, all_threads=True)
    except (ImportError, AttributeError, ValueError):
        pass
    if args.distributed:
        if args.coordinator_address:
            jax.distributed.initialize(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()
    # after distributed init: probing the backend initializes it
    from offsetguided_tpu.utils.cache import (
        enable_persistent_cache_if_accelerated)
    enable_persistent_cache_if_accelerated()

    from offsetguided_tpu.config.defaults import (AugmentationConfig,
                                                  EncoderConfig, HeadsConfig,
                                                  LossConfig, ModelConfig,
                                                  SkeletonConfig, TrainConfig)
    from offsetguided_tpu.data import CocoKeypoints, batch_iterator
    from offsetguided_tpu.models import PoseNet, checkpoint as ckpt
    from offsetguided_tpu.ops.encoder import downscale_mask, encode_targets
    from offsetguided_tpu.parallel import (batch_sharding, create_train_state,
                                           make_mesh, make_optimizer,
                                           jit_train_step, replicated,
                                           step_lr_schedule)
    from offsetguided_tpu.utils import AverageMeter, Throughput, configure, \
        log_record

    log = configure(args.log_file)
    logger = logging.getLogger('train')

    skeleton = (SkeletonConfig.crowdpose() if args.dataset == 'crowdpose'
                else SkeletonConfig.coco(args.n_limbs))
    heads = HeadsConfig(
        n_keypoints=skeleton.n_keypoints, n_limbs=skeleton.n_limbs,
        include_background=not args.no_background,
        include_jitter_offset=not args.no_jitter_offset,
        include_scale=not args.no_scale)
    if args.debug_tiny_model:
        model_cfg = ModelConfig(basenet=args.basenet, n_stacks=args.n_stacks,
                                hg_order=2, dims=(16, 16, 24),
                                modules=(1, 1, 1), cnv_dim=16,
                                compute_dtype='float32', heads=heads,
                                remat=args.remat)
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
        model_cfg = ModelConfig(basenet=args.basenet, n_stacks=args.n_stacks,
                                heads=heads, remat=args.remat, **width_kw)
    enc_cfg = EncoderConfig(max_persons=args.max_persons, sigma=args.sigma,
                            gaussian_clip=args.gaussian_clip,
                            fill_jitter_size=args.fill_jitter_size,
                            fill_scale_size=args.fill_scale_size)
    loss_cfg = LossConfig(
        heatmap_loss=args.hmp_loss, offset_loss=args.offset_loss,
        jitter_loss=args.jitter_offset_loss, scale_loss=args.scale_loss,
        fgamma=args.fgamma, ftao=args.ftao, lambdas=tuple(args.lambdas),
        offset_margin=args.lmargin, scale_margin=args.scale_margin,
        sqrt_re=args.sqrt_re,
        stack_weights=(tuple(args.stack_weights) if args.stack_weights
                       else (1.0,) * args.n_stacks))
    n_dev = jax.device_count()
    train_cfg = TrainConfig(optimizer=args.optimizer,
                            opt_state_dtype=args.opt_state_dtype,
                            learning_rate=args.lr * n_dev,
                            momentum=args.momentum,
                            weight_decay=args.weight_decay,
                            epochs=args.epochs, batch_size=args.batch_size,
                            warmup_epochs=args.warmup_epochs,
                            square_length=args.square_length,
                            checkpoint_dir=args.checkpoint_dir,
                            seed=args.seed)

    aug_cfg = AugmentationConfig(
        square_length=args.square_length, flip_prob=args.flip_prob,
        max_rotate=args.max_rotate, min_scale=args.min_scale,
        max_scale=args.max_scale, min_stretch=args.min_stretch,
        max_stretch=args.max_stretch, max_translate=args.max_translate)
    dataset = CocoKeypoints(
        args.train_image_dir, args.train_annotations, skeleton=skeleton,
        aug=aug_cfg,
        square_length=args.square_length, max_persons=args.max_persons,
        n_images=args.n_images, device_aug=args.device_aug,
        raw_canvas=args.raw_canvas)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    logger.info('dataset: %d images, %d steps/epoch, %d devices',
                len(dataset), steps_per_epoch, n_dev)

    # the data axis must divide the global batch; use the largest divisor
    n_data = max(d for d in range(1, n_dev + 1) if args.batch_size % d == 0)
    if n_data != n_dev:
        logger.warning('batch size %d not divisible by %d devices; '
                       'using %d-way data parallelism',
                       args.batch_size, n_dev, n_data)
    mesh = make_mesh(n_data, 1)
    model = PoseNet(model_cfg)
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.square_length, args.square_length, 3)),
        train=False)
    if args.torch_checkpoint:
        variables, unmatched = ckpt.load_torch_checkpoint(
            args.torch_checkpoint, variables, model_cfg)
        logger.info('torch warm start from %s (%d unmatched entries '
                    'keep their fresh init)', args.torch_checkpoint,
                    len(unmatched))
    schedule = step_lr_schedule(train_cfg, steps_per_epoch)
    tx = make_optimizer(train_cfg, schedule)
    if args.max_grad_norm:
        import optax
        tx = optax.chain(optax.clip_by_global_norm(args.max_grad_norm), tx)
    if args.freeze:
        import optax
        # freeze_mask is True where trainable; zero gradients where frozen
        frozen = jax.tree_util.tree_map(
            lambda trainable: not trainable,
            ckpt.freeze_mask(variables['params'], args.freeze))
        tx = optax.chain(optax.masked(optax.set_to_zero(), frozen), tx)
    state = create_train_state(variables, tx)
    start_epoch = 0
    if args.resume:
        state, start_epoch, best = ckpt.load_checkpoint(
            args.resume, state, drop_optimizer=args.drop_optim_state,
            drop_layers=args.drop_layers, recount_epoch=args.recount_epoch)
        logger.info('resumed from %s at epoch %d', args.resume, start_epoch)

    state = jax.device_put(state, replicated(mesh))
    bsh = batch_sharding(mesh)
    # state donated: optimizer state updated in place, not double-buffered
    train_step = jit_train_step(model, tx, loss_cfg)
    out_hw = args.square_length // enc_cfg.stride
    sigmas = np.asarray(skeleton.sigmas)
    n_proc = jax.process_count()
    if n_proc > 1:
        assert args.batch_size % n_proc == 0, (args.batch_size, n_proc)

    def put(arr):
        """Host batch -> globally batch-sharded device array.

        Multi-process SPMD (reference torch.distributed.launch flow,
        README.md:160): every process iterates the same deterministic global
        batch stream and contributes only its contiguous slice — `make_mesh`
        lays processes out contiguously along the data axis.
        """
        if n_proc == 1:
            return jax.device_put(arr, bsh)
        per = arr.shape[0] // n_proc
        lo = jax.process_index() * per
        return jax.make_array_from_process_local_data(bsh, arr[lo:lo + per])

    def host_scalar(x):
        """float(x) that also works on multi-process (non-fully-addressable)
        replicated outputs."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = x.addressable_data(0)
        return float(x)

    def save_ckpt(epoch, train_loss):
        # multi-process: orbax requires EVERY process to enter save (it
        # coordinates via the jax.distributed barrier and writes from the
        # primary host); gating to process 0 would deadlock.
        # Non-blocking: the device->host copy happens here (safe under state
        # donation), the disk write overlaps the next epoch; drained at exit.
        path = ckpt.save_checkpoint(args.checkpoint_dir, state, epoch,
                                    train_loss, blocking=False)
        return path if jax.process_index() == 0 else None

    # Single-transfer feed: pack every per-sample host array into ONE
    # uint8[B, row_bytes] buffer -> one put per step -> unpack inside the
    # jitted aug/encode program. The per-put fixed cost dominates on
    # remote/tunneled devices (~290 ms x 9 arrays for device-aug, measured;
    # BENCHMARKS.md round 4) and the packed buffer keeps the batch dim, so
    # the multi-process sharded put() is unchanged.
    from offsetguided_tpu.parallel.feed import (build_feed_spec,
                                                pack_host_batch,
                                                unpack_device_batch)
    _feed = {}   # spec + compiled consumer, built from the first batch

    def _packed_fn(batch, kind):
        if kind not in _feed:
            spec = build_feed_spec(batch, exclude=('metas', 'epoch'))

            if kind == 'device_aug':
                @jax.jit
                def fn(flat):
                    # device augmentation (ops/augment.py) + GT encoding,
                    # one program (per-op eager dispatch would be hundreds
                    # of dispatches per batch)
                    from offsetguided_tpu.ops.augment import augment_batch_dict
                    dev = unpack_device_batch(flat, spec)
                    from offsetguided_tpu.ops.augment import warp_slope_bound
                    imgs, mask01, anns2 = augment_batch_dict(
                        dev, args.square_length,
                        dataset.left_index, dataset.right_index,
                        warp_impl=args.warp_impl,
                        slope_bound=warp_slope_bound(aug_cfg))
                    targets = encode_targets(anns2, sigmas, skeleton.skeleton,
                                             out_hw, out_hw, enc_cfg)
                    return imgs, targets, downscale_mask(mask01, enc_cfg)
            else:
                @jax.jit
                def fn(flat):
                    dev = unpack_device_batch(flat, spec)
                    targets = encode_targets(dev['anns'], sigmas,
                                             skeleton.skeleton,
                                             out_hw, out_hw, enc_cfg)
                    # images stay uint8; normalized in-step
                    return (dev['image'], targets,
                            downscale_mask(dev['mask_miss'], enc_cfg))
            _feed[kind] = (spec, fn)
        return _feed[kind]

    def device_batch(batch):
        kind = 'device_aug' if 'aug_mat' in batch else 'host_aug'
        if kind == 'host_aug':
            batch = {k: batch[k] for k in ('image', 'anns', 'mask_miss')}
        spec, fn = _packed_fn(batch, kind)
        return fn(put(pack_host_batch(batch, spec)))

    # optional validation-loss pass per epoch (reference test(),
    # train_dist.py:390-455)
    val_dataset = None
    if args.val_image_dir and args.val_annotations:
        from offsetguided_tpu.parallel import make_eval_step
        val_dataset = CocoKeypoints(
            args.val_image_dir, args.val_annotations, skeleton=skeleton,
            aug=None, square_length=args.square_length,
            max_persons=args.max_persons)
        eval_step = jax.jit(make_eval_step(model, loss_cfg))

    def run_validation(state, epoch):
        vmeter = AverageMeter()
        for vb in batch_iterator(val_dataset, args.batch_size, seed=1,
                                 shuffle=False, epochs=1):
            vi, vt, vm = device_batch(vb)
            losses = eval_step(state, vi, vt, vm)
            vmeter.update(host_scalar(losses['total']))
        log_record(logger, 'val', type='val', epoch=epoch, loss=vmeter.avg)
        return vmeter.avg

    meter = AverageMeter()
    tput = Throughput()
    step = 0
    epoch = start_epoch
    # finally: drain the in-flight async checkpoint write on EVERY exit —
    # clean end, max-steps return, exception, or KeyboardInterrupt — so a
    # failed background write surfaces here instead of being lost
    host_wait = 0.0     # blocked on the loader (JPEG decode, mask render)
    feed_time = 0.0     # host->device put + aug/encode program dispatch
    try:
        with mesh:
            it = iter(batch_iterator(dataset, args.batch_size,
                                     seed=args.seed,
                                     epochs=args.epochs - start_epoch,
                                     num_workers=args.loader_workers))
            while True:
                t0 = time.perf_counter()
                batch = next(it, None)
                if batch is None:
                    if (epoch - start_epoch) % args.save_every != 0:
                        path = save_ckpt(epoch, meter.avg)
                        if path:
                            logger.info('final checkpoint %s', path)
                    break
                t1 = time.perf_counter()
                images, targets, mask = device_batch(batch)
                t2 = time.perf_counter()
                host_wait += t1 - t0
                feed_time += t2 - t1
                state, metrics = train_step(state, images, targets, mask)
                step += 1
                if args.max_steps is not None and step >= args.max_steps:
                    path = save_ckpt(epoch, meter.avg)
                    if path:
                        logger.info('max-steps reached, checkpoint %s', path)
                    return
                tput.tick(args.batch_size)
                if step % args.print_freq == 0:
                    m = {k: host_scalar(v) for k, v in metrics.items()}
                    meter.update(m['total'])
                    log_record(logger, 'train', type='train', epoch=epoch,
                               step=step, loss=m['total'], head_losses=m,
                               imgs_per_sec=round(tput.rate, 2),
                               host_wait_s=round(host_wait, 2),
                               feed_s=round(feed_time, 2))
                    host_wait = feed_time = 0.0
                if step % steps_per_epoch == 0:
                    epoch += 1
                    if val_dataset is not None:
                        val_loss = run_validation(state, epoch)
                        logger.info('epoch %d val loss %.4f', epoch, val_loss)
                    if (epoch - start_epoch) % args.save_every == 0:
                        path = save_ckpt(epoch, meter.avg)
                        if path:
                            logger.info('epoch %d done, checkpoint %s', epoch,
                                        path)
                    meter.reset()
    finally:
        ckpt.wait_for_saves()


if __name__ == '__main__':
    main()
