"""HTTP serving entry point: health, single + concurrent micro-batched
pose requests, malformed input.

No reference counterpart (the reference stops at demo_batch.py); the server
wraps the evaluator's jitted forward+decode program behind cross-request
micro-batching, so the decode outputs here are parity-tested elsewhere —
these tests pin the HTTP/batching layer.
"""
import json
import threading
import urllib.error
import urllib.request

import cv2
import numpy as np
import pytest

from offsetguided_tpu.cli import serve


@pytest.fixture(scope='module')
def server_url():
    args = serve.cli(['--debug-tiny-model', '--long-edge', '128',
                      '--batch-size', '2', '--batch-window-ms', '30',
                      '--port', '0', '--request-timeout-s', '300'])
    infer, skeleton, eval_cfg = serve.build_infer(args)
    # warm-compile before serving, as main() does (a loaded 1-core CI host
    # can take >60s to compile; requests must never eat that)
    import jax.numpy as jnp
    np.asarray(infer(jnp.zeros((2, 128, 128, 3), jnp.uint8))[2])
    srv = serve.make_server(args, infer, skeleton, eval_cfg)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f'http://{host}:{port}'
    srv.shutdown()
    srv.server_close()


def _jpeg_bytes(rng, h=97, w=153):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    ok, buf = cv2.imencode('.jpg', img)
    assert ok
    return buf.tobytes()


def _post(url, body):
    req = urllib.request.Request(url + '/v1/poses', data=body,
                                 headers={'Content-Type': 'image/jpeg'})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + '/healthz', timeout=60) as r:
        assert r.status == 200
        payload = json.loads(r.read())
    assert payload['status'] == 'ok'
    assert payload['n_keypoints'] == 17
    assert payload['batch_size'] == 2


def test_single_pose_request(server_url, rng):
    status, payload = _post(server_url, _jpeg_bytes(rng))
    assert status == 200
    assert payload['image'] == {'width': 153, 'height': 97}
    assert isinstance(payload['poses'], list)
    for pose in payload['poses']:        # random weights: usually empty
        assert len(pose['keypoints']) == 17
        assert 0.0 <= pose['score'] <= 1.0
    assert payload['latency_ms'] > 0


def test_concurrent_requests_microbatch(server_url, rng):
    """More concurrent requests than the batch capacity: every request gets
    its own answer with its own image's dimensions."""
    bodies = [_jpeg_bytes(rng, h=90 + i, w=140 + i) for i in range(5)]
    results = [None] * len(bodies)

    def go(i):
        results[i] = _post(server_url, bodies[i])

    threads = [threading.Thread(target=go, args=(i,))
               for i in range(len(bodies))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, res in enumerate(results):
        assert res is not None, f'request {i} never finished'
        status, payload = res
        assert status == 200
        assert payload['image'] == {'width': 140 + i, 'height': 90 + i}


def test_bad_image_rejected(server_url):
    req = urllib.request.Request(
        server_url + '/v1/poses', data=b'not an image',
        headers={'Content-Type': 'image/jpeg'})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400


def test_empty_body_rejected(server_url):
    req = urllib.request.Request(server_url + '/v1/poses', data=b'',
                                 headers={'Content-Type': 'image/jpeg'})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400


def test_metrics_endpoint(server_url, rng):
    _post(server_url, _jpeg_bytes(rng))
    with urllib.request.urlopen(server_url + '/metrics', timeout=60) as r:
        assert r.status == 200
        m = json.loads(r.read())
    assert m['requests'] >= 1
    assert m['batches'] >= 1
    assert m['errors'] == 0
    assert m['batch_capacity'] == 2
    assert 0 < m['mean_batch_fill'] <= 2
    assert m['device_batch_latency_ms']['p50'] > 0
