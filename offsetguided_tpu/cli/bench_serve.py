#!/usr/bin/env python
"""Load benchmark for the pose-serving endpoint (cli/serve.py).

Launches `og-serve` as a subprocess, waits for /healthz (recording the
cold/warm start time, i.e. model init + XLA compile -- the persistent
compile cache makes reruns warm), then drives a closed-loop load of
concurrent JPEG POSTs for a fixed duration and reports:

- sustained QPS (completed requests / wall time)
- client-observed request latency p50/p90/p99 (ms)
- server-side device-batch latency percentiles + mean batch fill
  (scraped from /metrics)

Usage:
    python tools/bench_serve.py --concurrency 16 --duration 30 \
        [--batch-size 8] [--batch-window-ms 5] [--debug-tiny-model]

No reference counterpart (the reference has no serving path); numbers land
in BENCHMARKS.md.
"""
import argparse
import json
import os
import signal
import socket
import statistics
import subprocess
import sys
import threading
import time
import urllib.request


def free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def make_test_jpegs(n: int, seed: int = 0):
    """Painted multi-person scenes (realistic decode load, not blank noise)."""
    import tempfile

    import cv2
    import numpy as np

    from offsetguided_tpu.data.synthetic import make_hard_dataset

    root = tempfile.mkdtemp(prefix='bench_serve_')
    img_dir, _ = make_hard_dataset(root, n_images=n, seed=seed, paint=True)
    blobs = []
    for name in sorted(os.listdir(img_dir)):
        with open(os.path.join(img_dir, name), 'rb') as f:
            blobs.append(f.read())
    return blobs


def cli(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--concurrency', type=int, default=16,
                   help='closed-loop client threads')
    p.add_argument('--duration', type=float, default=30.0,
                   help='measured load phase seconds (after warmup)')
    p.add_argument('--warmup-requests', type=int, default=16)
    p.add_argument('--n-images', type=int, default=24,
                   help='distinct JPEG payloads cycled by the clients')
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--batch-window-ms', type=float, default=5.0)
    p.add_argument('--long-edge', type=int, default=640)
    p.add_argument('--flip-test', action='store_true')
    p.add_argument('--debug-tiny-model', action='store_true')
    p.add_argument('--startup-timeout-s', type=float, default=1800.0)
    p.add_argument('--json', action='store_true', help='one-line JSON output')
    p.add_argument('--in-process', action='store_true',
                   help='drive the micro-batcher directly (no HTTP, no '
                        'subprocess, preprocessed images): pins the '
                        'device-side serving ceiling instead of sampling '
                        'relay/tunnel conditions')
    return p.parse_args(argv)


def run_in_process(args):
    """Device-side micro-batcher ceiling (VERDICT round-4 item 6): drive
    `serve.Batcher` directly — no HTTP, no subprocess, images preprocessed
    ONCE — so the measurement is batcher logic + host->device put + the
    jitted infer. Also reports `device_time` of the infer on a RESIDENT
    batch: the transfer-free compute floor the '~26 QPS/chip at fill 8'
    projection was based on."""
    import numpy as np

    from offsetguided_tpu.cli import serve as serve_mod
    from offsetguided_tpu.utils.profiling import device_time

    serve_argv = ['--batch-size', str(args.batch_size),
                  '--batch-window-ms', str(args.batch_window_ms),
                  '--long-edge', str(args.long_edge)]
    if args.flip_test:
        serve_argv.append('--flip-test')
    if args.debug_tiny_model:
        serve_argv.append('--debug-tiny-model')
    sargs = serve_mod.cli(serve_argv)

    t0 = time.monotonic()
    infer, skeleton, eval_cfg = serve_mod.build_infer(sargs)

    # preprocess the painted test scenes once (the HTTP path would decode
    # and resize per request; here that host cost is removed by design)
    import cv2

    from offsetguided_tpu.eval.harness import preprocess_eval
    blobs = make_test_jpegs(args.n_images)
    imgs, metas = [], []
    for blob in blobs:
        raw = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
        raw = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        fimg, _, meta = preprocess_eval(
            raw, np.zeros((0, skeleton.n_keypoints, 4), np.float32),
            eval_cfg, skeleton.n_keypoints, normalize=False)
        imgs.append(fimg.astype(np.uint8))
        metas.append(meta)

    # warm the compile, then pin the resident-batch floor
    import jax.numpy as jnp
    resident = jnp.asarray(np.stack(imgs[:args.batch_size]))
    infer(resident)
    startup_s = time.monotonic() - t0
    floor_s = device_time(infer, resident)

    batcher = serve_mod.Batcher(infer, args.batch_size, args.batch_window_ms)
    lats = []
    errors = []
    lock = threading.Lock()
    stop = threading.Event()

    def worker(wid: int):
        i = wid
        mine, mine_err = [], 0
        try:
            while not stop.is_set():
                t1 = time.monotonic()
                try:
                    batcher.submit(imgs[i % len(imgs)], metas[i % len(metas)])
                    mine.append(time.monotonic() - t1)
                except Exception:
                    if stop.is_set():
                        break
                    mine_err += 1
                i += args.concurrency
        finally:
            with lock:
                lats.extend(mine)
                errors.append(mine_err)

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(args.concurrency)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    time.sleep(args.duration)
    stop.set()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    if not lats:
        print(json.dumps({'error': 'no requests completed',
                          'client_errors': sum(errors)}))
        return 1
    lats.sort()
    pct = lambda q: round(lats[min(int(q * len(lats)), len(lats) - 1)] * 1e3,
                          1)
    out = {
        'mode': 'in_process',
        'qps': round(len(lats) / wall, 2),
        'requests': len(lats),
        'client_errors': sum(errors),
        'duration_s': round(wall, 1),
        'concurrency': args.concurrency,
        'batch_size': args.batch_size,
        'batch_window_ms': args.batch_window_ms,
        'flip_test': args.flip_test,
        'startup_s': round(startup_s, 1),
        'device_floor_ms_per_batch': round(floor_s * 1e3, 1),
        'device_floor_qps_at_full_fill': round(args.batch_size / floor_s, 1),
        'submit_latency_ms': {'p50': pct(0.50), 'p90': pct(0.90),
                              'p99': pct(0.99),
                              'mean': round(statistics.mean(lats) * 1e3, 1)},
        'batcher': batcher.metrics(),
    }
    print(json.dumps(out) if args.json else json.dumps(out, indent=2))
    return 0


def main(argv=None):
    args = cli(argv)
    if args.in_process:
        return run_in_process(args)
    port = free_port()
    # -m spawn works from both a source checkout and a pip install (a
    # repo-relative tools/serve.py path would not exist in site-packages)
    serve_args = [sys.executable, '-m', 'offsetguided_tpu.cli.serve',
                  '--port', str(port),
                  '--batch-size', str(args.batch_size),
                  '--batch-window-ms', str(args.batch_window_ms),
                  '--long-edge', str(args.long_edge)]
    if args.flip_test:
        serve_args.append('--flip-test')
    if args.debug_tiny_model:
        serve_args.append('--debug-tiny-model')

    blobs = make_test_jpegs(args.n_images)
    base = f'http://127.0.0.1:{port}'

    t_start = time.monotonic()
    proc = subprocess.Popen(serve_args, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        startup_s = None
        while time.monotonic() - t_start < args.startup_timeout_s:
            if proc.poll() is not None:
                raise RuntimeError(f'server exited rc={proc.returncode}')
            try:
                with urllib.request.urlopen(base + '/healthz', timeout=2) as r:
                    if r.status == 200:
                        startup_s = time.monotonic() - t_start
                        break
            except OSError:
                time.sleep(0.5)
        if startup_s is None:
            raise TimeoutError('server did not become healthy')

        def post(blob) -> float:
            req = urllib.request.Request(
                base + '/v1/poses', data=blob,
                headers={'Content-Type': 'image/jpeg'})
            t0 = time.monotonic()
            with urllib.request.urlopen(req, timeout=120) as r:
                json.loads(r.read())
            return time.monotonic() - t0

        for i in range(args.warmup_requests):
            post(blobs[i % len(blobs)])

        lats = []
        errors = []
        lock = threading.Lock()
        stop = threading.Event()

        def worker(wid: int):
            i = wid
            mine = []
            mine_err = 0
            try:
                while not stop.is_set():
                    try:
                        mine.append(post(blobs[i % len(blobs)]))
                    except OSError:
                        if stop.is_set():   # teardown race: not a failure
                            break
                        mine_err += 1       # count it, keep the thread alive
                    i += args.concurrency
            finally:
                # always bank this thread's samples, even on an unexpected
                # exception — silently dropping them skews QPS/percentiles
                with lock:
                    lats.extend(mine)
                    errors.append(mine_err)

        threads = [threading.Thread(target=worker, args=(w,))
                   for w in range(args.concurrency)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        time.sleep(args.duration)
        stop.set()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0

        with urllib.request.urlopen(base + '/metrics', timeout=5) as r:
            server_metrics = json.loads(r.read())
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()

    if not lats:
        print(json.dumps({'error': 'no requests completed',
                          'client_errors': sum(errors),
                          'startup_s': round(startup_s, 1)}))
        return 1
    lats.sort()
    pct = lambda q: round(lats[min(int(q * len(lats)), len(lats) - 1)] * 1e3, 1)
    out = {
        'qps': round(len(lats) / wall, 2),
        'requests': len(lats),
        'client_errors': sum(errors),
        'duration_s': round(wall, 1),
        'concurrency': args.concurrency,
        'batch_size': args.batch_size,
        'batch_window_ms': args.batch_window_ms,
        'flip_test': args.flip_test,
        'startup_s': round(startup_s, 1),
        'latency_ms': {'p50': pct(0.50), 'p90': pct(0.90), 'p99': pct(0.99),
                       'mean': round(statistics.mean(lats) * 1e3, 1)},
        'server': server_metrics,
    }
    print(json.dumps(out) if args.json else json.dumps(out, indent=2))
    return 0


if __name__ == '__main__':
    sys.exit(main())
