#!/usr/bin/env python
"""Batched HTTP pose-estimation server (production serving entry point).

No reference counterpart (the reference stops at demo_batch.py); this wraps
the same jitted forward+decode program the evaluator uses
(eval/harness.py::make_infer_fn) behind a thread-per-connection HTTP server
with cross-request micro-batching: concurrent requests are collected for up
to --batch-window-ms (or until --batch-size images), padded into the one
compiled fixed-shape program, and dispatched as a single device batch — the
TPU-friendly way to serve (one XLA program, no recompiles, MXU kept busy).

Endpoints:
  GET  /healthz    -> {"status": "ok", ...}
  POST /v1/poses   (body: JPEG/PNG bytes) ->
      {"image": {"width": W, "height": H},
       "poses": [{"keypoints": [[x, y, score] * J], "score": s}, ...]}
Keypoint coordinates are in ORIGINAL image pixels (inverse of the
rescale+pad preprocessing, same as evaluation).
"""
import argparse
import json
import queue
import threading
import time

import numpy as np


def cli(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--checkpoint', default=None, help='orbax checkpoint path')
    p.add_argument('--torch-checkpoint', default=None,
                   help='reference .pth checkpoint to convert and serve')
    p.add_argument('--dataset', default='coco', choices=['coco', 'crowdpose'])
    p.add_argument('--long-edge', type=int, default=640)
    p.add_argument('--flip-test', action='store_true')
    p.add_argument('--batch-size', type=int, default=8,
                   help='micro-batch capacity (the compiled batch shape)')
    p.add_argument('--batch-window-ms', type=float, default=5.0,
                   help='max time to wait collecting a micro-batch')
    p.add_argument('--topk', type=int, default=32)
    p.add_argument('--thre-hmp', type=float, default=0.04)
    p.add_argument('--dist-max', type=float, default=40.0)
    p.add_argument('--person-thre', type=float, default=0.06)
    p.add_argument('--lowres-decode', action='store_true')
    p.add_argument('--min-len', type=float, default=0.5)
    p.add_argument('--sort-dim', type=int, default=2, choices=[2, 4])
    p.add_argument('--resize-mode', default='bicubic',
                   choices=['bicubic', 'bilinear'])
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--request-timeout-s', type=float, default=60.0,
                   help='max seconds a request waits for its micro-batch')
    p.add_argument('--debug-tiny-model', action='store_true',
                   help='narrow random-weight backbone (CI / smoke use)')
    return p.parse_args(argv)


def build_infer(args):
    """Model + decoder + one jitted fixed-shape infer; returns
    (infer(images_u8[B,S,S,3]) -> (poses, scores, counts), skeleton, cfg)."""
    import jax
    import jax.numpy as jnp
    from offsetguided_tpu.config.defaults import (DecoderConfig, EvalConfig,
                                                  HeadsConfig, ModelConfig,
                                                  SkeletonConfig)
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.harness import make_infer_fn
    from offsetguided_tpu.models import PoseNet, checkpoint as ckpt

    skeleton = (SkeletonConfig.crowdpose() if args.dataset == 'crowdpose'
                else SkeletonConfig())
    heads = HeadsConfig(n_keypoints=skeleton.n_keypoints,
                        n_limbs=skeleton.n_limbs)
    if args.debug_tiny_model:
        model_cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                                modules=(1, 1, 1), cnv_dim=8,
                                compute_dtype='float32', heads=heads)
    else:
        model_cfg = ModelConfig(heads=heads)
    model = PoseNet(model_cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    if args.torch_checkpoint:
        variables, _ = ckpt.load_torch_checkpoint(
            args.torch_checkpoint, variables, model_cfg)
    elif args.checkpoint:
        from offsetguided_tpu.config.defaults import TrainConfig
        from offsetguided_tpu.parallel import (create_train_state,
                                               make_optimizer)
        state = create_train_state(variables, make_optimizer(TrainConfig()))
        state, _, _ = ckpt.load_checkpoint(args.checkpoint, state,
                                           drop_optimizer=True)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}

    pp = PostProcessor(skeleton=skeleton, cfg=DecoderConfig(
        topk=args.topk, thre_hmp=args.thre_hmp, dist_max=args.dist_max,
        person_thre=args.person_thre, min_len=args.min_len,
        sort_dim=args.sort_dim, resize_mode=args.resize_mode,
        upsampled_decode=not args.lowres_decode))
    eval_cfg = EvalConfig(long_edge=args.long_edge, flip_test=args.flip_test,
                          batch_size=args.batch_size)
    infer = make_infer_fn(model, variables, pp, args.flip_test)
    return infer, skeleton, eval_cfg


class Batcher:
    """Cross-request micro-batching onto one fixed-shape compiled program.

    Requests enqueue (image, meta); a single dispatcher thread collects up
    to `batch_size` of them within `window_ms`, zero-pads to the compiled
    batch shape, runs the jitted infer once, and hands each request its
    inverse-transformed poses."""

    def __init__(self, infer, batch_size: int, window_ms: float):
        self._infer = infer
        self._bs = batch_size
        self._window = window_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        # observability (read under _mlock by /metrics)
        self._mlock = threading.Lock()
        self.n_requests = 0
        self.n_batches = 0
        self.n_errors = 0
        self._fill_sum = 0          # images per dispatched batch
        self._lat_ring = []         # last 512 device-batch latencies (s)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def metrics(self) -> dict:
        with self._mlock:
            lats = sorted(self._lat_ring)
            n = len(lats)
            pct = (lambda q: round(lats[min(int(q * n), n - 1)] * 1e3, 1)
                   ) if n else (lambda q: None)
            return {
                'requests': self.n_requests,
                'batches': self.n_batches,
                'errors': self.n_errors,
                'batch_capacity': self._bs,
                'mean_batch_fill': (round(self._fill_sum / self.n_batches, 2)
                                    if self.n_batches else None),
                'device_batch_latency_ms': {
                    'p50': pct(0.50), 'p90': pct(0.90), 'p99': pct(0.99)},
                'queue_depth': self._q.qsize(),
            }

    def submit(self, image: np.ndarray, meta, timeout: float = 60.0):
        """Blocks until this request's batch returns; poses in original
        image coordinates, shape (M, J, >=3)."""
        ev = threading.Event()
        slot = {}
        self._q.put((image, meta, ev, slot))
        if not ev.wait(timeout):
            raise TimeoutError('inference timed out')
        if 'error' in slot:
            raise slot['error']
        return slot['poses']

    def _loop(self):
        import jax.numpy as jnp
        from offsetguided_tpu.data import transforms as T
        while True:
            first = self._q.get()
            batch = [first]
            deadline = time.monotonic() + self._window
            while len(batch) < self._bs:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            imgs = [b[0] for b in batch]
            while len(imgs) < self._bs:           # pad to the compiled shape
                imgs.append(np.zeros_like(imgs[0]))
            t0 = time.monotonic()
            try:
                poses, _, counts = self._infer(jnp.asarray(np.stack(imgs)))
                poses = np.asarray(poses)
                counts = np.asarray(counts)
                for i, (_, meta, ev, slot) in enumerate(batch):
                    valid = poses[i][:int(counts[i])]
                    slot['poses'] = T.annotations_inverse(valid, meta)
                    ev.set()
                err = 0
            except Exception as e:  # surface device errors to every waiter
                for _, _, ev, slot in batch:
                    slot['error'] = e
                    ev.set()
                err = len(batch)
            with self._mlock:
                self.n_requests += len(batch)
                self.n_batches += 1
                self.n_errors += err
                self._fill_sum += len(batch)
                self._lat_ring.append(time.monotonic() - t0)
                if len(self._lat_ring) > 512:
                    del self._lat_ring[0]


def poses_to_json(poses: np.ndarray) -> list:
    out = []
    for person in np.asarray(poses):
        if not np.any(person[:, :3]):
            continue
        kps = [[round(float(x), 2), round(float(y), 2), round(float(v), 4)]
               for x, y, v in person[:, :3]]
        out.append({'keypoints': kps,
                    'score': round(float(person[:, 2].mean()), 4)})
    return out


def make_server(args, infer, skeleton, eval_cfg):
    """ThreadingHTTPServer wired to a Batcher; returned unstarted so tests
    can bind port 0 and read `server.server_address`."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import cv2
    from offsetguided_tpu.eval.harness import preprocess_eval

    batcher = Batcher(infer, eval_cfg.batch_size, args.batch_window_ms)
    n_kp = skeleton.n_keypoints

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):      # quiet per-request stderr spam
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                import jax
                self._json(200, {
                    'status': 'ok',
                    'device': jax.devices()[0].platform,
                    'long_edge': eval_cfg.long_edge,
                    'batch_size': eval_cfg.batch_size,
                    'flip_test': eval_cfg.flip_test,
                    'n_keypoints': n_kp})
            elif self.path == '/metrics':
                self._json(200, batcher.metrics())
            else:
                self._json(404, {'error': 'not found'})

        def do_POST(self):
            if self.path != '/v1/poses':
                self._json(404, {'error': 'not found'})
                return
            length = int(self.headers.get('Content-Length', 0))
            if length <= 0:
                self._json(400, {'error': 'empty body'})
                return
            raw = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self._json(400, {'error': 'undecodable image'})
                return
            h, w = img.shape[:2]
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            t0 = time.monotonic()
            fimg, _, meta = preprocess_eval(
                img, np.zeros((0, n_kp, 4), np.float32), eval_cfg, n_kp,
                normalize=False)      # uint8 wire format; device normalizes
            try:
                poses = batcher.submit(fimg, meta,
                                       timeout=args.request_timeout_s)
            except Exception as e:
                self._json(500, {'error': f'{type(e).__name__}: {e}'})
                return
            self._json(200, {
                'image': {'width': w, 'height': h},
                'poses': poses_to_json(poses),
                'latency_ms': round((time.monotonic() - t0) * 1e3, 1)})

    return ThreadingHTTPServer((args.host, args.port), Handler)


def main(argv=None):
    import jax.numpy as jnp
    from offsetguided_tpu.utils.cache import (
        enable_persistent_cache_if_accelerated)
    args = cli(argv)
    enable_persistent_cache_if_accelerated()   # TPU: startup compile cached
    infer, skeleton, eval_cfg = build_infer(args)
    s = eval_cfg.long_edge
    print(f'compiling ({eval_cfg.batch_size}, {s}, {s}) program...',
          flush=True)
    warm = infer(jnp.zeros((eval_cfg.batch_size, s, s, 3), jnp.uint8))
    np.asarray(warm[2])                       # block: compile before serving
    server = make_server(args, infer, skeleton, eval_cfg)
    host, port = server.server_address[:2]
    print(f'serving on http://{host}:{port} '
          f'(POST /v1/poses, GET /healthz)', flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == '__main__':
    import sys
    sys.exit(main())
