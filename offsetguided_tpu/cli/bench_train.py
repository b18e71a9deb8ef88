#!/usr/bin/env python
"""Training-step throughput benchmark (device-resident synthetic data).

Measures the jitted train step alone — forward + backward + optimizer with
donated state — at the production configuration, so memory/perf knobs
(--remat, --device-aug, batch size, bf16) can be A/B'd in one command.
The data pipeline is measured separately by bench_data.py; real end-to-end
training throughput is min(this, host pipeline).

Prints one JSON line: {"metric", "value", "unit", "config"}.
"""
import argparse
import json
import time


import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--square-length', type=int, default=512)
    p.add_argument('--remat', action='store_true')
    p.add_argument('--device-aug', action='store_true',
                   help='include the device augmentation program '
                        '(ops/augment.py) in the measured step')
    p.add_argument('--raw-canvas', type=int, default=640)
    p.add_argument('--warp-impl', default='tiled',
                   choices=['patch', 'tiled'],
                   help='device-aug warp formulation (see og-train)')
    p.add_argument('--n1', type=int, default=3)
    p.add_argument('--n2', type=int, default=9)
    p.add_argument('--debug-tiny-model', action='store_true')
    args = p.parse_args(argv)

    from offsetguided_tpu.utils.cache import (
        enable_persistent_cache_if_accelerated)
    enable_persistent_cache_if_accelerated()

    from offsetguided_tpu.config import (COCO_PERSON_SIGMAS,
                                         COCO_PERSON_SKELETON)
    from offsetguided_tpu.config.defaults import (EncoderConfig, HeadsConfig,
                                                  LossConfig, ModelConfig,
                                                  TrainConfig)
    from offsetguided_tpu.models import PoseNet
    from offsetguided_tpu.ops.encoder import downscale_mask, encode_targets
    from offsetguided_tpu.parallel import (create_train_state, jit_train_step,
                                           make_optimizer)

    S = args.square_length
    B = args.batch_size
    J, L = 17, 19
    if args.debug_tiny_model:
        cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(16, 16, 24),
                          modules=(1, 1, 1), cnv_dim=16,
                          compute_dtype='float32', remat=args.remat)
    else:
        cfg = ModelConfig(remat=args.remat)
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    tx = make_optimizer(TrainConfig())
    state = create_train_state(variables, tx)
    step = jit_train_step(model, tx, LossConfig())

    rng = np.random.RandomState(0)
    enc = EncoderConfig(max_persons=16)
    anns = np.zeros((B, 16, J, 4), np.float32)
    anns[:, :4, :, 0] = rng.rand(B, 4, J) * S
    anns[:, :4, :, 1] = rng.rand(B, 4, J) * S
    anns[:, :4, :, 2] = 2.0
    anns[:, :4, :, 3] = 16.0
    sig = np.asarray(COCO_PERSON_SIGMAS)
    out_hw = S // enc.stride

    if args.device_aug:
        from offsetguided_tpu.ops.augment import augment_batch_dict
        C0 = args.raw_canvas
        eye = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        eye[:, 0, 0] = S / C0        # simple rescale matrices
        eye[:, 1, 1] = S / C0
        raw = {
            'image': jnp.asarray(rng.randint(0, 255, (B, C0, C0, 3)),
                                 jnp.uint8),
            'mask_miss': jnp.full((B, C0, C0), 255, jnp.uint8),
            'anns': jnp.asarray(anns * C0 / S),
            'aug_mat': jnp.asarray(eye),
            'aug_mat_inv': jnp.asarray(np.linalg.inv(eye)[:, :2]),
            'aug_scale_xy': jnp.full((B, 2), S / C0, jnp.float32),
            'aug_flags': jnp.zeros((B, 2), jnp.float32),
            'aug_tint': jnp.zeros((B, 4), jnp.float32),
            'valid_hw': jnp.full((B, 2), C0, jnp.int32),
        }

        @jax.jit
        def prepare():
            imgs, mask01, anns2 = augment_batch_dict(
                raw, S, [1, 3], [2, 4], warp_impl=args.warp_impl)
            t = encode_targets(anns2, sig, COCO_PERSON_SKELETON,
                               out_hw, out_hw, enc)
            return imgs, t, downscale_mask(mask01, enc)
    else:
        images = jnp.asarray(rng.randint(0, 255, (B, S, S, 3)), jnp.uint8)

        @jax.jit
        def prepare():
            t = encode_targets(jnp.asarray(anns), sig, COCO_PERSON_SKELETON,
                               out_hw, out_hw, enc)
            return images, t, jnp.ones((B, out_hw, out_hw, 1), bool)

    def run_n(state, n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            imgs, targets, mask = prepare()
            state, m = step(state, imgs, targets, mask)
        float(m['total'])            # sync (block_until_ready is a no-op
        return state, time.perf_counter() - t0   # over the axon tunnel)

    state, _ = run_n(state, 2)       # warm-up / compile
    state, t1 = run_n(state, args.n1)
    state, t2 = run_n(state, args.n2)
    dt = (t2 - t1) / (args.n2 - args.n1)
    print(json.dumps({
        'metric': 'train_step_imgs_per_sec',
        'value': round(B / max(dt, 1e-9), 2),
        'unit': 'img/s',
        'config': {'batch': B, 'square': S, 'remat': args.remat,
                   'device_aug': args.device_aug,
                   'tiny': args.debug_tiny_model,
                   'step_ms': round(dt * 1e3, 2)},
    }))
    return 0


if __name__ == '__main__':
    import sys
    sys.exit(main())
