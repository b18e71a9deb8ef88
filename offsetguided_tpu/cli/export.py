#!/usr/bin/env python
"""Model export + summary: StableHLO serialization and FLOPs/param counting.

TPU-native counterpart of the reference's debug tooling (torchsummary +
torch.onnx export + thop FLOPs, models/hourglass_104.py:395-433): the jitted
forward is exported with `jax.export` (StableHLO bytes, loadable by any
XLA-based serving stack), and compute cost comes from XLA's own cost analysis.
"""
import argparse
import os
import sys


import jax
import jax.numpy as jnp
import numpy as np


def cli(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--basenet', default='hourglass104',
                   choices=['hourglass104', 'hourglass52', 'hourglass4stage'])
    p.add_argument('--input-size', type=int, default=512)
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--output', default=None,
                   help='write serialized StableHLO to this path')
    p.add_argument('--checkpoint', default=None,
                   help='orbax checkpoint (a tools/train.py save) to export')
    p.add_argument('--torch-checkpoint', default=None)
    p.add_argument('--to-torch', default=None, metavar='PATH',
                   help='write the weights as a reference-format .pth '
                        '(loadable by the reference framework, strict=True)')
    p.add_argument('--with-decode', action='store_true',
                   help='export forward + full decode instead of forward only')
    p.add_argument('--debug-tiny-model', action='store_true')
    p.add_argument('--hg-order', type=int, default=None,
                   help='hourglass recursion depth override (with --dims/'
                        '--modules/--cnv-dim: narrower real-depth variants)')
    p.add_argument('--dims', default=None,
                   help='comma-separated per-level channel dims')
    p.add_argument('--modules', default=None,
                   help='comma-separated per-level residual-module counts')
    p.add_argument('--cnv-dim', type=int, default=None)
    p.add_argument('--n-stacks', type=int, default=None)
    return p.parse_args(argv)


def summarize(variables) -> dict:
    """Per-top-module parameter counts (torchsummary-style)."""
    out = {}
    total = 0
    for top, sub in variables['params'].items():
        n = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(sub))
        out[top] = n
        total += n
    out['TOTAL'] = total
    return out


def main(argv=None):
    args = cli(argv)
    from offsetguided_tpu.config.defaults import DecoderConfig, ModelConfig
    from offsetguided_tpu.models import PoseNet, checkpoint as ckpt

    if args.debug_tiny_model:
        cfg = ModelConfig(basenet=args.basenet, n_stacks=1, hg_order=2,
                          dims=(8, 8, 12), modules=(1, 1, 1), cnv_dim=8,
                          compute_dtype='float32')
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
        cfg = ModelConfig(basenet=args.basenet, **width_kw)
    model = PoseNet(cfg)
    s = args.input_size
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    if args.torch_checkpoint:
        variables, _ = ckpt.load_torch_checkpoint(args.torch_checkpoint,
                                                  variables, cfg)
    elif args.checkpoint:
        from offsetguided_tpu.config.defaults import TrainConfig
        from offsetguided_tpu.parallel import (create_train_state,
                                               make_optimizer)
        state = create_train_state(variables, make_optimizer(TrainConfig()))
        state, _, _ = ckpt.load_checkpoint(args.checkpoint, state,
                                           drop_optimizer=True)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}

    for name, n in summarize(variables).items():
        print(f'{name:>20}: {n / 1e6:10.3f} M params')

    if args.to_torch:
        ckpt.save_torch_checkpoint(args.to_torch, variables, cfg)
        print(f'wrote reference-format torch checkpoint: {args.to_torch}')

    if args.with_decode:
        from offsetguided_tpu.decoder import PostProcessor
        pp = PostProcessor(cfg=DecoderConfig())

        def fwd(v, x):
            return pp._decode_body(model.apply(v, x, train=False), False)
    else:
        def fwd(v, x):
            return model.apply(v, x, train=False)

    x = jnp.zeros((args.batch_size, s, s, 3), jnp.float32)
    lowered = jax.jit(fwd).lower(variables, x)
    try:
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = cost.get('flops', float('nan'))
        print(f'XLA cost analysis: {flops / 1e9:.2f} GFLOPs '
              f'({flops / 2e9:.2f} GMACs) @ {args.batch_size}x{s}x{s} '
              f'(reference thop count, which tallies MACs: 234.5 G @512^2)')
    except Exception as e:  # cost analysis is backend-dependent
        print(f'cost analysis unavailable: {e}')

    if args.output:
        exported = jax.export.export(jax.jit(fwd))(variables, x)
        data = exported.serialize()
        with open(args.output, 'wb') as f:
            f.write(data)
        print(f'wrote StableHLO export: {args.output} '
              f'({len(data) / 1e6:.1f} MB)')


if __name__ == '__main__':
    main()
