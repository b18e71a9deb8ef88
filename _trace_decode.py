"""Trace the full decode program and list device op totals (all ops)."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from offsetguided_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache('/tmp/jax_bench_cache')

from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.decoder import PostProcessor
from offsetguided_tpu.cli.profile_forward import aggregate_trace

n, hw = 8, 160
rng = np.random.RandomState(0)
hmp = jnp.asarray(rng.rand(n, hw, hw, 17).astype(np.float32) ** 8)
omp = jnp.asarray((rng.randn(n, hw, hw, 38) * 10).astype(np.float32))
jomp = jnp.asarray((rng.randn(n, hw, hw, 2) * 0.5).astype(np.float32))
scmp = jnp.asarray((rng.rand(n, hw, hw, 17) * 8).astype(np.float32))
preds = {'hmp': [hmp], 'bg': [None], 'jomp': [jomp], 'omp': [omp],
         'spread': [None], 'scmp': [scmp]}

cfg = DecoderConfig(topk=32, thre_hmp=0.04, dist_max=40.0)
pp = PostProcessor(cfg=cfg)
full = jax.jit(lambda p: pp._decode_body(p, False))

out = full(preds)
np.asarray(jax.device_get(out[0][0, 0, 0, 0]))  # sync

iters = 5
jax.profiler.start_trace('/tmp/dec_trace')
for _ in range(iters):
    out = full(preds)
np.asarray(jax.device_get(out[0][0, 0, 0, 0]))
jax.profiler.stop_trace()

res = aggregate_trace('/tmp/dec_trace', top=400)
if res is None:
    print('no trace')
    sys.exit(1)
rows, total = res
print(f'total device time {total/iters:.3f} ms/iter over {iters} iters; '
      f'{len(rows)} distinct ops')
for dur, cnt, name in rows:
    print(f'{dur/iters:8.4f} ms  x{cnt:4d}  {name}')
