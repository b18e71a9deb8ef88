"""OKS AP evaluator sanity: perfect detections -> AP 1.0, degradations."""
import numpy as np

from offsetguided_tpu.config import COCO_PERSON_SIGMAS
from offsetguided_tpu.eval.cocoeval import KeypointEval, compute_oks


def make_gt(rng, img_id, n_persons, area=90000):
    gts = []
    for p in range(n_persons):
        xy = rng.rand(17, 2) * 200 + p * 250
        kps = np.concatenate([xy, np.full((17, 1), 2.0)], axis=1)
        gts.append({'id': img_id * 100 + p, 'image_id': img_id,
                    'keypoints': kps.reshape(-1).tolist(),
                    'area': area, 'bbox': [xy[:, 0].min(), xy[:, 1].min(),
                                           200, 200],
                    'iscrowd': 0, 'num_keypoints': 17})
    return gts


def dt_from_gt(gt, score=0.9, noise=0.0, rng=None):
    kps = np.asarray(gt['keypoints']).reshape(-1, 3).copy()
    if noise:
        kps[:, :2] += rng.randn(17, 2) * noise
    return {'image_id': gt['image_id'], 'keypoints': kps.reshape(-1).tolist(),
            'score': score}


def test_oks_identical_is_one(rng):
    gt = make_gt(rng, 1, 1)[0]
    dt = dt_from_gt(gt)
    oks = compute_oks(np.asarray(dt['keypoints']).reshape(-1, 3),
                      np.asarray(gt['keypoints']).reshape(-1, 3),
                      gt['area'], gt['bbox'], np.asarray(COCO_PERSON_SIGMAS))
    assert abs(oks - 1.0) < 1e-9


def test_perfect_detections_ap1(rng):
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    gts, dts = {}, {}
    for img in range(4):
        g = make_gt(rng, img, 2)
        gts[img] = g
        dts[img] = [dt_from_gt(x, score=0.8 + 0.01 * i)
                    for i, x in enumerate(g)]
    stats = ev.run(gts, dts)
    assert abs(stats['AP'] - 1.0) < 1e-6
    assert abs(stats['AR'] - 1.0) < 1e-6
    assert abs(stats['AP50'] - 1.0) < 1e-6


def test_half_detected_ap(rng):
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    gts, dts = {}, {}
    for img in range(4):
        g = make_gt(rng, img, 2)
        gts[img] = g
        dts[img] = [dt_from_gt(g[0], score=0.9)]   # only first person
    stats = ev.run(gts, dts)
    assert 0.45 < stats['AP'] <= 0.55
    assert 0.45 < stats['AR'] <= 0.55


def test_noisy_detections_degrade(rng):
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    gts, dts = {}, {}
    for img in range(4):
        g = make_gt(rng, img, 2)
        gts[img] = g
        dts[img] = [dt_from_gt(x, score=0.9, noise=20.0, rng=rng) for x in g]
    stats = ev.run(gts, dts)
    assert stats['AP'] < 1.0
    assert stats['AP50'] >= stats['AP75'] - 1e-9


def test_false_positives_hurt_precision(rng):
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    g = make_gt(rng, 0, 1)
    fake = dt_from_gt(make_gt(rng, 0, 2)[1], score=0.95)
    stats = ev.run({0: g}, {0: [dt_from_gt(g[0], score=0.9), fake]})
    assert stats['AP'] < 1.0


def test_crowdpose_bands(rng, tmp_path):
    import json
    from offsetguided_tpu.config.crowdpose import CROWDPOSE_SIGMAS
    from offsetguided_tpu.eval.cocoeval import evaluate_crowdpose_keypoints
    J = 14
    images, annotations, results = [], [], []
    ann_id = 1
    for img_id, ci in [(1, 0.0), (2, 0.5), (3, 0.9)]:
        images.append({'id': img_id, 'file_name': f'{img_id}.jpg',
                       'height': 400, 'width': 400, 'crowdIndex': ci})
        xy = rng.rand(J, 2) * 300 + 20
        kps = np.concatenate([xy, np.full((J, 1), 2.0)], 1)
        annotations.append({'id': ann_id, 'image_id': img_id,
                            'category_id': 1, 'iscrowd': 0,
                            'keypoints': kps.reshape(-1).tolist(),
                            'num_keypoints': J, 'area': 90000.0,
                            'bbox': [20, 20, 300, 300]})
        ann_id += 1
        results.append({'image_id': img_id, 'category_id': 1,
                        'keypoints': kps.reshape(-1).tolist(), 'score': 0.9})
    f = tmp_path / 'cp.json'
    f.write_text(json.dumps({'images': images, 'annotations': annotations,
                             'categories': [{'id': 1, 'name': 'person'}]}))
    stats = evaluate_crowdpose_keypoints(str(f), results, CROWDPOSE_SIGMAS)
    assert abs(stats['AP'] - 1.0) < 1e-6
    for k in ('AP_easy', 'AP_medium', 'AP_hard'):
        assert abs(stats[k] - 1.0) < 1e-6
