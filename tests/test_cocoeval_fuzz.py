"""Differential fuzz: eval/cocoeval.py vs the pycocotools transliteration.

The vectorized evaluator (offsetguided_tpu/eval/cocoeval.py) is the
framework's acceptance metric, standing in for pycocotools COCOeval
(/root/reference/evaluate.py:303-328). tests/cocoeval_strict.py is a
line-faithful behavioral port of pycocotools kept ONLY as an oracle; this
fuzz asserts all ten summary metrics agree on randomized scenes covering the
interaction effects the hand-computed golden tests (tests/test_cocoeval.py)
cannot: crowd GTs + area-range edges, num_keypoints=0, >maxDets detections,
tied scores within and across images, detections on GT-less images.
"""
import numpy as np
import pytest

from offsetguided_tpu.config.coco import COCO_PERSON_SIGMAS
from offsetguided_tpu.eval.cocoeval import KeypointEval

from cocoeval_strict import evaluate_strict

J = 17


def _random_gt(rng, img_w=640, img_h=640):
    # areas biased to straddle the 32^2 / 96^2 range boundaries
    side = rng.choice([16.0, 31.9, 32.0, 50.0, 95.9, 96.0, 97.0, 200.0])
    side = float(side * rng.uniform(0.8, 1.25))
    x0 = rng.uniform(0, img_w - side)
    y0 = rng.uniform(0, img_h - side)
    kps = np.zeros((J, 3))
    n_vis = int(rng.choice([0, 0, 1, 3, 8, 17]))
    vis_idx = rng.permutation(J)[:n_vis]
    for k in vis_idx:
        kps[k, 0] = x0 + rng.uniform(0, side)
        kps[k, 1] = y0 + rng.uniform(0, side)
        kps[k, 2] = rng.choice([1, 2])
    return {
        'keypoints': kps.reshape(-1).tolist(),
        'area': side * side,
        'bbox': [x0, y0, side, side],
        'iscrowd': int(rng.random() < 0.2),
        'num_keypoints': int(n_vis),
    }


def _random_dt(rng, gts, img_w=640, img_h=640, score_levels=None):
    kps = np.zeros((J, 3))
    if gts and rng.random() < 0.7:
        # perturbation of a random GT (drives real matches at varied OKS)
        g = gts[int(rng.integers(len(gts)))]
        gk = np.asarray(g['keypoints']).reshape(J, 3)
        scale = np.sqrt(g['area'])
        n_det = int(rng.integers(1, J + 1))
        det_idx = rng.permutation(J)[:n_det]
        for k in det_idx:
            base = gk[k, :2] if gk[k, 2] > 0 else \
                np.asarray(g['bbox'][:2]) + rng.uniform(0, scale, 2)
            kps[k, 0:2] = base + rng.normal(0, 0.1 * scale + 1e-3, 2)
            kps[k, 2] = rng.uniform(0.05, 1.0)
    else:
        n_det = int(rng.integers(1, J + 1))
        det_idx = rng.permutation(J)[:n_det]
        for k in det_idx:
            kps[k] = [rng.uniform(0, img_w), rng.uniform(0, img_h),
                      rng.uniform(0.05, 1.0)]
    if score_levels:
        score = float(rng.choice(score_levels))   # forced ties
    else:
        score = float(rng.uniform(0.01, 1.0))
    return {'keypoints': kps.reshape(-1).tolist(), 'score': score}


def _random_scene(seed):
    rng = np.random.default_rng(seed)
    n_img = int(rng.integers(1, 6))
    # quantized score grid on some scenes: ties within AND across images
    score_levels = ([0.2, 0.5, 0.5, 0.9] if rng.random() < 0.4 else None)
    gts_by_img, dts_by_img = {}, {}
    for i in range(n_img):
        img_id = 100 + i
        gts = [_random_gt(rng) for _ in range(int(rng.integers(0, 8)))]
        # >maxDets sometimes (exercises the double truncation)
        n_dt = int(rng.choice([0, 1, 3, 8, 25]))
        dts = [_random_dt(rng, gts, score_levels=score_levels)
               for _ in range(n_dt)]
        if gts or rng.random() < 0.5:     # detections on GT-less images too
            gts_by_img[img_id] = gts
            dts_by_img[img_id] = dts
    if not gts_by_img:
        gts_by_img[100] = [_random_gt(rng)]
        dts_by_img[100] = []
    return gts_by_img, dts_by_img


@pytest.mark.parametrize('seed_base', [0, 1000, 2000, 3000])
def test_fuzz_vs_pycocotools_port(seed_base):
    sigmas = np.asarray(COCO_PERSON_SIGMAS)
    ev = KeypointEval(sigmas)
    for seed in range(seed_base, seed_base + 30):
        gts_by_img, dts_by_img = _random_scene(seed)
        ours = ev.run(gts_by_img, dts_by_img)
        ref = evaluate_strict(gts_by_img, dts_by_img, sigmas)
        for key in ('AP', 'AP50', 'AP75', 'APm', 'APl',
                    'AR', 'AR50', 'AR75', 'ARm', 'ARl'):
            assert ours[key] == pytest.approx(ref[key], abs=1e-12), (
                f'seed {seed}: {key} ours={ours[key]} ref={ref[key]}')


def test_crowd_absorption_with_area_edges():
    """Crowd GT exactly on the medium/large boundary absorbing two dets."""
    sigmas = np.asarray(COCO_PERSON_SIGMAS)
    kp = np.zeros((J, 3))
    kp[0] = [100, 100, 2]
    gt = {'keypoints': kp.reshape(-1).tolist(), 'area': 96.0 ** 2,
          'bbox': [90, 90, 20, 20], 'iscrowd': 1, 'num_keypoints': 1}
    d1 = {'keypoints': kp.reshape(-1).tolist(), 'score': 0.9}
    d2k = kp.copy()
    d2k[0, 0] += 1
    d2 = {'keypoints': d2k.reshape(-1).tolist(), 'score': 0.8}
    gts = {1: [gt]}
    dts = {1: [d1, d2]}
    ours = KeypointEval(sigmas).run(gts, dts)
    ref = evaluate_strict(gts, dts, sigmas)
    for key in ours:
        assert ours[key] == pytest.approx(ref[key], abs=1e-12)
