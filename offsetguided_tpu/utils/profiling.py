"""Profiling helpers: jax.profiler traces + per-stage wall timing.

TPU counterpart of the reference's ad-hoc `time.time()` +
`torch.cuda.synchronize()` instrumentation (demo_batch.py:245-291,
decoder/collect.py:87). On tunneled devices `block_until_ready` may not
synchronize, so `device_time` drains the execution queue with a tiny scalar
fetch and differences two run lengths to cancel fixed fetch latency.
"""
from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax_trace'):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def device_time(fn: Callable, *args, n1: int = 4, n2: int = 12,
                warmup: int = 2, min_seconds: float = 0.25,
                repeats: int = 3) -> float:
    """Seconds per call of a jitted function, robust to async tunnels.

    Differences two run lengths to cancel the fixed fetch latency, but over
    a relayed device the per-RPC jitter is tens of ms — comparable to a few
    calls of a ms-scale program — so short runs can under-report by 2x+
    (measured: a 2.77 ms Pallas kernel timed as 1.31 ms with n1=4/n2=12).
    Run lengths are therefore scaled until the long run takes at least
    `min_seconds`, and the marginal estimate is the median of `repeats`
    pair measurements."""
    def run_n(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        if out is not None:
            _drain(out)
        return time.perf_counter() - t0

    run_n(warmup)
    t2 = run_n(n2)
    while t2 < min_seconds and 2 * n2 <= 4096:
        n1, n2 = 2 * n1, 2 * n2
        t2 = run_n(n2)
    estimates = []
    for _ in range(max(repeats, 1)):
        t1 = run_n(n1)
        t2 = run_n(n2)
        estimates.append((t2 - t1) / (n2 - n1))
    return max(statistics.median(estimates), 0.0)


class StageTimer:
    """Accumulate named stage timings (host wall-clock)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {'total_s': round(v, 4),
                    'mean_ms': round(1000 * v / self.counts[k], 3)}
                for k, v in self.totals.items()}
