"""End-to-end integration over a synthetic on-disk COCO dataset: data
pipeline, oracle simulate path (GT encoder -> decoder -> inverse -> OKS AP),
and the eval harness with a real (random) model.
"""
import json
import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from offsetguided_tpu.config import COCO_PERSON_SIGMAS, COCO_PERSON_SKELETON
from offsetguided_tpu.config.defaults import (DecoderConfig, EncoderConfig,
                                              EvalConfig, HeadsConfig,
                                              ModelConfig, SkeletonConfig)

TEMPLATE = np.array([
    [0.50, 0.07], [0.46, 0.05], [0.54, 0.05], [0.42, 0.07], [0.58, 0.07],
    [0.36, 0.22], [0.64, 0.22], [0.32, 0.40], [0.68, 0.40], [0.30, 0.57],
    [0.70, 0.57], [0.41, 0.54], [0.59, 0.54], [0.40, 0.75], [0.60, 0.75],
    [0.39, 0.95], [0.61, 0.95]], dtype=np.float32)


@pytest.fixture(scope='module')
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('synthcoco')
    img_dir = root / 'images'
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 5):
        h, w = 256, 320
        img = (rng.rand(h, w, 3) * 80 + 60).astype(np.uint8)
        n_persons = 1 + img_id % 2
        for p in range(n_persons):
            # persons must be large enough that distinct keypoints' sigma=7
            # Gaussians don't merge (an inherent encode/decode scale limit
            # shared with the reference)
            box = 130 + rng.rand() * 60
            x0 = 10 + p * 150 + rng.rand() * 10
            y0 = 10 + rng.rand() * 30
            kps = np.zeros((17, 3), np.float32)
            kps[:, 0] = x0 + TEMPLATE[:, 0] * box + rng.rand(17) * 0.7
            kps[:, 1] = y0 + TEMPLATE[:, 1] * box + rng.rand(17) * 0.7
            kps[:, 2] = 2
            bw = kps[:, 0].max() - kps[:, 0].min() + 6
            bh = kps[:, 1].max() - kps[:, 1].min() + 6
            bx, by = kps[:, 0].min() - 3, kps[:, 1].min() - 3
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'keypoints': kps.reshape(-1).tolist(),
                'num_keypoints': 17, 'iscrowd': 0,
                'bbox': [float(bx), float(by), float(bw), float(bh)],
                'area': float(bw * bh * 0.6),
                'segmentation': [[float(bx), float(by), float(bx + bw),
                                  float(by), float(bx + bw), float(by + bh),
                                  float(bx), float(by + bh)]],
            })
            ann_id += 1
        name = f'{img_id:06d}.jpg'
        cv2.imwrite(str(img_dir / name), img)
        images.append({'id': img_id, 'file_name': name, 'height': h,
                       'width': w})
    ann = {'images': images, 'annotations': annotations,
           'categories': [{'id': 1, 'name': 'person'}]}
    ann_file = root / 'annotations.json'
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_dataset_pipeline_shapes(coco_dir):
    from offsetguided_tpu.config.defaults import AugmentationConfig
    from offsetguided_tpu.data import CocoKeypoints, batch_iterator
    img_dir, ann_file = coco_dir
    ds = CocoKeypoints(img_dir, ann_file, aug=AugmentationConfig(
        square_length=64, max_translate=10), square_length=64, max_persons=8)
    assert len(ds) == 4
    batches = list(batch_iterator(ds, batch_size=2, epochs=1, seed=0))
    assert len(batches) == 2
    b = batches[0]
    assert b['image'].shape == (2, 64, 64, 3)
    assert b['anns'].shape == (2, 8, 17, 4)
    assert b['mask_miss'].shape == (2, 64, 64)
    assert b['image'].dtype == np.uint8       # normalized on device
    assert b['mask_miss'].dtype == np.uint8


def test_loader_worker_count_invariance(coco_dir):
    """Batch contents/order must be IDENTICAL for 0 workers (thread) and N
    worker processes: augmentation RNG derives from (seed, epoch, batch), not
    from who produced it."""
    from offsetguided_tpu.config.defaults import AugmentationConfig
    from offsetguided_tpu.data import CocoKeypoints, batch_iterator
    img_dir, ann_file = coco_dir
    ds = CocoKeypoints(img_dir, ann_file, aug=AugmentationConfig(
        square_length=64, max_translate=10), square_length=64, max_persons=8)
    # batch_size 3 over 4 images with drop_last=False also exercises the
    # PARTIAL final batch through the fixed-size shared-memory slots
    for bs, drop_last, n_expect in ((2, True, 4), (3, False, 4)):
        serial = list(batch_iterator(ds, batch_size=bs, epochs=2, seed=3,
                                     drop_last=drop_last))
        parallel = list(batch_iterator(ds, batch_size=bs, epochs=2, seed=3,
                                       drop_last=drop_last, num_workers=2))
        assert len(serial) == len(parallel) == n_expect
        for a, b in zip(serial, parallel):
            np.testing.assert_array_equal(a['image'], b['image'])
            np.testing.assert_array_equal(a['anns'], b['anns'])
            np.testing.assert_array_equal(a['mask_miss'], b['mask_miss'])
            assert a['epoch'] == b['epoch']


def test_loader_worker_error_propagates(coco_dir):
    """A failing worker must raise in the parent, not hang the iterator."""
    import pytest
    from offsetguided_tpu.data import CocoKeypoints, batch_iterator
    img_dir, ann_file = coco_dir
    ds = CocoKeypoints(img_dir, ann_file, square_length=64)
    ds.image_dir = '/nonexistent-dir'      # force IOError inside workers
    with pytest.raises(RuntimeError, match='data worker failed'):
        list(batch_iterator(ds, batch_size=2, epochs=1, num_workers=2))


class _HardCrashDataset:
    """Pickles into spawn workers; kills the process on first get() --
    bypasses the worker's try/except, simulating an OOM-kill/cv2 segfault."""

    def __init__(self, inner):
        self._inner = inner
        # layout attributes _mp_batch_iterator reads in the parent
        self.square = inner.square
        self.max_persons = inner.max_persons
        self.skeleton = inner.skeleton
        self.sample_spec = inner.sample_spec

    def __len__(self):
        return len(self._inner)

    def get(self, i, rng, epoch=0):
        import os
        os._exit(3)


def test_loader_worker_death_detected(coco_dir):
    """A worker killed WITHOUT enqueueing a result (OOM killer, native
    crash) must raise in the parent via the liveness check, not hang on
    result_q.get() forever."""
    import pytest
    from offsetguided_tpu.data import CocoKeypoints, batch_iterator
    img_dir, ann_file = coco_dir
    ds = _HardCrashDataset(CocoKeypoints(img_dir, ann_file, square_length=64))
    with pytest.raises(RuntimeError, match='died without a result'):
        list(batch_iterator(ds, batch_size=2, epochs=1, num_workers=1))


def test_oracle_simulate_ap(coco_dir):
    """GT -> encoder -> decoder -> inverse -> OKS AP must be near-perfect."""
    from offsetguided_tpu.data import transforms as T
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.cocoeval import evaluate_coco_keypoints
    from offsetguided_tpu.eval.harness import poses_to_coco_results
    from offsetguided_tpu.ops.encoder import encode_targets

    img_dir, ann_file = coco_dir
    skeleton = SkeletonConfig()
    enc_cfg = EncoderConfig(max_persons=8)
    size = 160
    pp = PostProcessor(cfg=DecoderConfig(
        topk=8, thre_hmp=0.1, dist_max=20.0, use_scale=False,
        person_thre=0.1, max_poses=8))
    coco = CocoJson(ann_file)
    sigmas = np.asarray(skeleton.sigmas)

    results = []
    for img_id in coco.image_ids(with_persons=True):
        info = coco.image_info(img_id)
        anns = T.normalize_annotations(coco.anns_for_image(img_id),
                                       skeleton.sigmas)
        meta = T.make_meta(info['width'], info['height'])
        dummy = np.zeros((info['height'], info['width'], 3), np.uint8)
        img2, anns, meta = T.rescale_long_absolute(dummy, anns, meta, size)
        _, anns, meta = T.center_pad(img2, anns, meta, size)
        padded = np.zeros((1, 8, 17, 4), np.float32)
        padded[0, :len(anns)] = anns[:8]
        t = encode_targets(jnp.asarray(padded), sigmas, COCO_PERSON_SKELETON,
                           size // 4, size // 4, enc_cfg)
        preds = {'hmp': [t.hmp], 'bg': [None], 'jomp': [t.jomp],
                 'omp': [t.omp], 'spread': [None], 'scmp': [None]}
        poses, scores, counts = pp.decode(preds)
        valid = np.asarray(poses[0])[:int(counts[0])]
        inv = T.annotations_inverse(valid, meta)
        results.extend(poses_to_coco_results(inv, img_id))

    stats = evaluate_coco_keypoints(coco, results, skeleton.sigmas)
    assert stats['AP'] > 0.85, stats
    assert stats['AP50'] > 0.95, stats


def test_eval_harness_with_random_model(coco_dir):
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.eval.harness import run_images
    from offsetguided_tpu.models import PoseNet

    img_dir, ann_file = coco_dir
    cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                      modules=(1, 1, 1), cnv_dim=8, compute_dtype='float32',
                      heads=HeadsConfig())
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pp = PostProcessor(cfg=DecoderConfig(topk=4, max_poses=4))
    eval_cfg = EvalConfig(long_edge=128, flip_test=True, batch_size=2)
    coco = CocoJson(ann_file)
    results = run_images(model, variables, pp, coco, img_dir, eval_cfg)
    assert len(results) >= 4
    for r in results:
        assert len(r['keypoints']) == 51
        assert 'score' in r and 'image_id' in r


def test_eval_harness_fixed_height(coco_dir):
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.eval.harness import run_images
    from offsetguided_tpu.models import PoseNet

    img_dir, ann_file = coco_dir
    cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                      modules=(1, 1, 1), cnv_dim=8, compute_dtype='float32',
                      heads=HeadsConfig())
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pp = PostProcessor(cfg=DecoderConfig(topk=4, max_poses=4))
    eval_cfg = EvalConfig(long_edge=64, fixed_height=True, max_stride=32,
                          flip_test=False, batch_size=1)
    coco = CocoJson(ann_file)
    results = run_images(model, variables, pp, coco, img_dir, eval_cfg)
    assert len(results) >= 4


def test_train_tool_smoke(coco_dir, tmp_path):
    """tools/train.py end-to-end: 3 optimizer steps on the synthetic dataset."""
    import sys
    sys.path.insert(0, 'tools')
    import importlib
    train_mod = importlib.import_module('train')
    img_dir, ann_file = coco_dir
    train_mod.main([
        '--train-image-dir', img_dir, '--train-annotations', ann_file,
        '--val-image-dir', img_dir, '--val-annotations', ann_file,
        '--square-length', '64', '--batch-size', '2', '--max-persons', '4',
        '--debug-tiny-model', '--max-steps', '3', '--epochs', '1',
        '--loader-workers', '2',
        '--checkpoint-dir', str(tmp_path / 'ckpt'), '--print-freq', '1'])
    import os
    assert any('posenet' in f for f in os.listdir(tmp_path / 'ckpt'))


def test_evaluate_tool_smoke(coco_dir, tmp_path, monkeypatch):
    """tools/evaluate.py end-to-end on the synthetic dataset (random net)."""
    import sys
    sys.path.insert(0, 'tools')
    import importlib
    ev = importlib.import_module('evaluate')
    img_dir, ann_file = coco_dir
    out = tmp_path / 'res.json'
    argv_backup = sys.argv
    sys.argv = ['evaluate.py', '--image-dir', img_dir,
                '--annotation-file', ann_file, '--long-edge', '128',
                '--batch-size', '2', '--results-json', str(out)]
    try:
        # shrink the model for CI speed
        from offsetguided_tpu.config import defaults as D
        orig = D.ModelConfig
        monkeypatch.setattr(
            D, 'ModelConfig',
            lambda **kw: orig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                              modules=(1, 1, 1), cnv_dim=8,
                              compute_dtype='float32',
                              heads=kw.get('heads', D.HeadsConfig())))
        ev.main()
    finally:
        sys.argv = argv_backup
    import json as _json
    res = _json.loads(out.read_text())
    assert len(res) >= 4


def test_demo_tool_smoke(coco_dir, tmp_path, monkeypatch):
    import matplotlib
    matplotlib.use('Agg')
    import sys, os
    sys.path.insert(0, 'tools')
    import importlib
    demo = importlib.import_module('demo')
    img_dir, ann_file = coco_dir
    img = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    from offsetguided_tpu.config import defaults as D
    orig = D.ModelConfig
    monkeypatch.setattr(
        D, 'ModelConfig',
        lambda **kw: orig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                          modules=(1, 1, 1), cnv_dim=8,
                          compute_dtype='float32',
                          heads=kw.get('heads', D.HeadsConfig())))
    argv_backup = sys.argv
    sys.argv = ['demo.py', img, '--long-edge', '64',
                '--output-dir', str(tmp_path), '--show-hmp-idx', '0',
                '--show-all-limbs', '--annotation-file', ann_file]
    try:
        demo.main()
    finally:
        sys.argv = argv_backup
    outs = list(tmp_path.iterdir())
    assert any(p.name.endswith('.poses.png') for p in outs)


def test_export_tool_smoke(tmp_path):
    import sys
    sys.path.insert(0, 'tools')
    import importlib
    ex = importlib.import_module('export')
    out = tmp_path / 'model.stablehlo'
    ex.main(['--debug-tiny-model', '--input-size', '64',
             '--output', str(out)])
    assert out.exists() and out.stat().st_size > 1000
    # the exported artifact deserializes and can be invoked
    import jax
    exported = jax.export.deserialize(out.read_bytes())
    assert exported is not None


def test_simulate_tool_smoke(coco_dir, capsys):
    import sys
    sys.path.insert(0, 'tools')
    import importlib
    sim = importlib.import_module('simulate')
    img_dir, ann_file = coco_dir
    argv_backup = sys.argv
    sys.argv = ['simulate.py', '--image-dir', img_dir,
                '--annotation-file', ann_file, '--long-edge', '160',
                '--topk', '8', '--dist-max', '20']
    try:
        sim.main()
    finally:
        sys.argv = argv_backup
    out = capsys.readouterr().out
    assert 'AP:' in out
    ap = float([l for l in out.splitlines() if l.startswith('AP:')][0]
               .split(':')[1])
    assert ap > 0.8, out


def test_simulate_tool_variant_flags(coco_dir, capsys):
    """The decoder-variant flags (--scored-offset / --cat-flip-offset /
    --guid-jitter-refine, reference decoder/factory.py:70-78) wire through
    the simulate CLI into DecoderConfig and the oracle still recovers the
    scene under the flip-merge path."""
    import sys
    sys.path.insert(0, 'tools')
    import importlib
    sim = importlib.import_module('simulate')
    img_dir, ann_file = coco_dir
    argv_backup = sys.argv
    sys.argv = ['simulate.py', '--image-dir', img_dir,
                '--annotation-file', ann_file, '--long-edge', '160',
                '--topk', '8', '--dist-max', '20', '--flip-test',
                '--scored-offset', '--cat-flip-offset',
                '--guid-jitter-refine']
    try:
        sim.main()
    finally:
        sys.argv = argv_backup
    out = capsys.readouterr().out
    assert 'AP:' in out
    ap = float([l for l in out.splitlines() if l.startswith('AP:')][0]
               .split(':')[1])
    assert ap > 0.8, out


def test_fixed_height_width_bucketing(tmp_path):
    """Fixed-height eval pads widths to `width_bucket` multiples so an epoch
    of varied aspect ratios compiles a bounded number of programs
    (reference context: evaluate.py:141-154), and unreadable images still
    produce a (dummy) record -- test-dev protocol requires one per image."""
    import json as _json
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval import harness
    from offsetguided_tpu.models import PoseNet

    img_dir = tmp_path / 'images'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    widths = [100, 150, 190, 260]
    images = []
    for i, w in enumerate(widths, start=1):
        name = f'{i:06d}.jpg'
        cv2.imwrite(str(img_dir / name),
                    (rng.rand(100, w, 3) * 255).astype(np.uint8))
        images.append({'id': i, 'file_name': name, 'height': 100, 'width': w})
    # a fifth image that exists but cannot be decoded
    (img_dir / 'broken.jpg').write_text('not a jpeg')
    images.append({'id': 99, 'file_name': 'broken.jpg',
                   'height': 100, 'width': 100})
    ann_file = tmp_path / 'ann.json'
    ann_file.write_text(_json.dumps({
        'images': images, 'annotations': [],
        'categories': [{'id': 1, 'name': 'person'}]}))

    cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                      modules=(1, 1, 1), cnv_dim=8, compute_dtype='float32',
                      heads=HeadsConfig())
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pp = PostProcessor(cfg=DecoderConfig(topk=4, max_poses=4))
    eval_cfg = EvalConfig(long_edge=64, fixed_height=True, max_stride=32,
                          width_bucket=64, flip_test=False, batch_size=1)

    seen_shapes = set()
    orig_make = harness.make_infer_fn

    def counting_make(*a, **kw):
        infer = orig_make(*a, **kw)

        def wrapped(images):
            seen_shapes.add(tuple(images.shape))
            return infer(images)
        return wrapped

    harness.make_infer_fn = counting_make
    try:
        results = harness.run_images(
            model, variables, pp, CocoJson(str(ann_file)), str(img_dir),
            eval_cfg, all_images=True)
    finally:
        harness.make_infer_fn = orig_make

    # rescaled widths 64/96/121/166 -> bucketed to 64/128/128/192:
    # 3 distinct shapes (plain max_stride=32 padding would compile 4)
    assert len(seen_shapes) == 3, seen_shapes
    assert all(s[2] % 64 == 0 for s in seen_shapes), seen_shapes
    # every listed image got a record, including the unreadable one
    assert {r['image_id'] for r in results} == {1, 2, 3, 4, 99}


def test_fixed_height_batched_matches_batch1(tmp_path):
    """Width bucketing makes BATCHED fixed-height eval possible (the
    reference is stuck at batch 1: every image has its own width,
    evaluate.py:141-154). Records must be identical to the batch-1 run —
    per-image decode is batch-independent — with same-shape images batched
    together and partial batches flushed at bucket boundaries."""
    import json as _json
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval import harness
    from offsetguided_tpu.models import PoseNet

    img_dir = tmp_path / 'images'
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    # aspect mix: 5 images over 2 width buckets (interleaved on purpose --
    # the harness must reorder by aspect, not rely on input order)
    widths = [100, 220, 110, 230, 100]
    images, anns = [], []
    for i, w in enumerate(widths, start=1):
        name = f'{i:06d}.jpg'
        cv2.imwrite(str(img_dir / name),
                    (rng.rand(100, w, 3) * 255).astype(np.uint8))
        images.append({'id': i, 'file_name': name, 'height': 100,
                       'width': w})
        kps = []
        for j in range(17):
            kps += [float(10 + (j % 5) * 8), float(10 + (j // 5) * 9), 2]
        anns.append({'id': i, 'image_id': i, 'category_id': 1,
                     'keypoints': kps, 'num_keypoints': 17, 'iscrowd': 0,
                     'bbox': [8.0, 8.0, 40.0, 40.0], 'area': 1600.0,
                     'segmentation': [[8.0, 8.0, 48.0, 8.0, 48.0, 48.0,
                                       8.0, 48.0]]})
    ann_file = tmp_path / 'ann.json'
    ann_file.write_text(_json.dumps({
        'images': images, 'annotations': anns,
        'categories': [{'id': 1, 'name': 'person'}]}))

    cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                      modules=(1, 1, 1), cnv_dim=8, compute_dtype='float32',
                      heads=HeadsConfig())
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pp = PostProcessor(cfg=DecoderConfig(topk=4, max_poses=4))
    coco = CocoJson(str(ann_file))

    def run(batch_size):
        eval_cfg = EvalConfig(long_edge=64, fixed_height=True, max_stride=32,
                              width_bucket=64, flip_test=False,
                              batch_size=batch_size)
        recs = harness.run_images(model, variables, pp, coco, str(img_dir),
                                  eval_cfg)
        by = {}
        for r in recs:
            by.setdefault(r['image_id'], set()).add(
                (tuple(np.round(r['keypoints'], 3)), round(r['score'], 5)))
        return by

    b1, b3 = run(1), run(3)
    assert set(b1) == set(b3) == {1, 2, 3, 4, 5}
    for i in b1:
        assert b1[i] == b3[i], (i, b1[i], b3[i])
