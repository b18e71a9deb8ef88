"""Forward-pass profiling on the TPU: wall time + per-op breakdown.

Times the flagship forward (Hourglass-104 + heads) at the benchmark
configuration, captures a jax.profiler trace, and aggregates device op
durations from the TraceViewer export so optimization work targets the
actual hot ops (reference perf target: README.md:72,95).
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp


from offsetguided_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('/tmp/jax_bench_cache')


def build_forward(batch, size, compute_dtype='bfloat16', **model_kw):
    from offsetguided_tpu.config.defaults import ModelConfig
    from offsetguided_tpu.models import PoseNet

    cfg = ModelConfig(compute_dtype=compute_dtype, **model_kw)
    model = PoseNet(cfg)
    image = jax.random.uniform(jax.random.PRNGKey(0),
                               (batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           train=False)

    @jax.jit
    def fwd(vars_, img):
        return model.apply(vars_, img, train=False)

    return fwd, variables, image


def aggregate_trace(log_dir, top=40):
    """Aggregate device-op durations from the TraceViewer json export."""
    paths = sorted(glob.glob(os.path.join(
        log_dir, 'plugins/profile/*/*.trace.json.gz')))
    if not paths:
        return None
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # device lanes: pid names containing 'TPU' / 'Device'; fall back to all
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'
                 and 'args' in e}
    device_pids = {p for p, nm in pid_names.items()
                   if 'TPU' in nm or 'Device' in nm or '/device' in nm.lower()}
    totals = collections.Counter()
    counts = collections.Counter()
    total_dur = 0.0
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if device_pids and e.get('pid') not in device_pids:
            continue
        name = e.get('name', '?')
        totals[name] += e['dur']
        counts[name] += 1
        total_dur += e['dur']
    rows = [(dur / 1e3, counts[name], name)
            for name, dur in totals.most_common(top)]
    return rows, total_dur / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=640)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--trace', action='store_true')
    ap.add_argument('--trace-iters', type=int, default=3)
    ap.add_argument('--log-dir', default='/tmp/fwd_trace')
    args = ap.parse_args()

    from offsetguided_tpu.utils.profiling import device_time

    fwd, variables, image = build_forward(args.batch, args.size, args.dtype)
    lowered = fwd.lower(variables, image)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = (cost or {}).get('flops', 0.0)

    dt = device_time(fwd, variables, image)
    print(f'forward {args.size}^2 batch {args.batch} {args.dtype}: '
          f'{dt * 1e3:.2f} ms/batch '
          f'({args.batch / dt:.1f} img/s, '
          f'{flops / dt / 1e12:.1f} TFLOP/s of {flops/1e12:.2f} TFLOP)')

    if args.trace:
        jax.profiler.start_trace(args.log_dir)
        out = None
        for _ in range(args.trace_iters):
            out = fwd(variables, image)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[:1, :1]))
        jax.profiler.stop_trace()
        res = aggregate_trace(args.log_dir)
        if res is None:
            print('no trace json found under', args.log_dir)
            return
        rows, total = res
        print(f'--- device op totals over {args.trace_iters} iters '
              f'(sum {total:.1f} ms) ---')
        for ms, cnt, name in rows:
            print(f'{ms:9.2f} ms  x{cnt:<4d} {name[:110]}')


if __name__ == '__main__':
    main()
