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


def make_crowd_gt(img_id, ann_id, bbox=(300.0, 300.0, 200.0, 200.0),
                  area=40000.0):
    """Crowd region annotation: iscrowd=1, no labeled keypoints (the COCO
    convention for person crowds)."""
    return {'id': ann_id, 'image_id': img_id,
            'keypoints': [0.0] * 51, 'num_keypoints': 0,
            'area': area, 'bbox': list(bbox), 'iscrowd': 1}


def dt_at(img_id, x, y, score):
    kps = np.tile([x, y, 1.0], 17).astype(np.float64)
    return {'image_id': img_id, 'keypoints': kps.tolist(), 'score': score}


def test_crowd_gt_absorbs_detection(rng):
    """pycocotools semantics: a detection overlapping an iscrowd GT is
    matched-and-ignored (bbox-distance OKS fallback), never a false positive.
    Reference acceptance metric: /root/reference/evaluate.py:303-328."""
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    g = make_gt(rng, 0, 1)
    crowd = make_crowd_gt(0, 999)
    dt_real = dt_from_gt(g[0], score=0.9)
    # all keypoints inside the crowd bbox -> bbox-fallback OKS == 1.0
    dt_in_crowd = dt_at(0, 350.0, 350.0, score=0.95)
    stats = ev.run({0: g + [crowd]}, {0: [dt_real, dt_in_crowd]})
    assert abs(stats['AP'] - 1.0) < 1e-6, \
        'detection on crowd region must be ignored, not an FP'
    # crowd GT must not inflate the recall denominator
    assert abs(stats['AR'] - 1.0) < 1e-6


def test_crowd_gt_absorbs_multiple_detections(rng):
    """A single crowd GT may be matched by any number of detections
    (pycocotools: 'if this gt already matched, and not a crowd, continue')."""
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    g = make_gt(rng, 0, 1)
    crowd = make_crowd_gt(0, 999)
    dts = [dt_from_gt(g[0], score=0.9),
           dt_at(0, 320.0, 330.0, 0.95),
           dt_at(0, 480.0, 470.0, 0.93)]
    stats = ev.run({0: g + [crowd]}, {0: dts})
    assert abs(stats['AP'] - 1.0) < 1e-6


def test_false_positive_precision_envelope(rng):
    """Hand-computed AP: 2 GTs; perfect dt on A (s=0.9), FP (s=0.8), perfect
    dt on B (s=0.7). Every threshold: tp=[1,0,1] -> rc=[.5,.5,1],
    pr=[1,.5,2/3], envelope [1,2/3,2/3]; 101-pt AP =
    (51*1 + 50*2/3)/101."""
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    g = make_gt(rng, 0, 2)
    far = dt_at(0, 5000.0, 5000.0, 0.8)      # overlaps nothing
    dts = [dt_from_gt(g[0], score=0.9), far, dt_from_gt(g[1], score=0.7)]
    stats = ev.run({0: g}, {0: dts})
    expected = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    assert abs(stats['AP'] - expected) < 1e-9
    assert abs(stats['AP50'] - expected) < 1e-9


def test_out_of_area_unmatched_detection_ignored(rng):
    """An unmatched detection whose area falls outside the range is ignored
    for that range (pycocotools dtIg |= (dtm==0) & out-of-range), so a tiny
    spurious detection cannot hurt AP-large."""
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    g = make_gt(rng, 0, 1, area=90000)       # large GT
    # detection spanning ~10px -> kp-box area ~100 < 96^2, out of 'large' rng
    kps = np.tile([1000.0, 1000.0, 1.0], 17).astype(np.float64)
    kps[0::3] += np.linspace(0, 10, 17)
    tiny = {'image_id': 0, 'keypoints': kps.tolist(), 'score': 0.99}
    stats = ev.run({0: g}, {0: [dt_from_gt(g[0], score=0.9), tiny]})
    assert abs(stats['APl'] - 1.0) < 1e-6, \
        'out-of-range unmatched detection must be ignored for APl'
    assert stats['AP'] < 1.0, 'but in the all-range it is a real FP'


def test_kp_area_uses_all_keypoint_positions():
    """loadRes boxes ALL keypoint positions (x[0::3]/y[0::3]) without
    filtering zeros; a detection with some (0,0) keypoints gets the box that
    includes the origin."""
    from offsetguided_tpu.eval.cocoeval import _kp_area
    kps = [0.0, 0.0, 0.0] * 10 + [100.0, 50.0, 2.0] * 7
    assert abs(_kp_area(kps) - 100.0 * 50.0) < 1e-9


def test_num_keypoints_zero_gt_is_ignored(rng):
    """A non-crowd GT with num_keypoints == 0 is ignore-matchable: missing it
    costs no recall, matching it costs no precision."""
    ev = KeypointEval(COCO_PERSON_SIGMAS)
    g = make_gt(rng, 0, 1)
    empty = {'id': 7, 'image_id': 0, 'keypoints': [0.0] * 51,
             'num_keypoints': 0, 'area': 10000.0,
             'bbox': [600.0, 600.0, 100.0, 100.0], 'iscrowd': 0}
    stats = ev.run({0: g + [empty]}, {0: [dt_from_gt(g[0], score=0.9)]})
    assert abs(stats['AP'] - 1.0) < 1e-6
    assert abs(stats['AR'] - 1.0) < 1e-6


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


def test_image_ids_restriction_matches_reference_imgids(rng, tmp_path):
    """`image_ids` restricts the metric to the evaluated subset — the
    reference sets cocoEval.params.imgIds = validation_ids when only part
    of the set is run (evaluate.py:324). Without it a subset run counts
    every unevaluated image's GT as missed recall."""
    import json
    from offsetguided_tpu.eval.cocoeval import evaluate_coco_keypoints

    images, annotations, results = [], [], []
    ann_id = 1
    for img_id in range(1, 9):
        images.append({'id': img_id, 'file_name': f'{img_id}.jpg',
                       'height': 500, 'width': 500})
        for g in make_gt(rng, img_id, 2):
            g['id'] = ann_id
            g['category_id'] = 1
            ann_id += 1
            annotations.append(g)
            if img_id <= 4:   # detections only for the "evaluated" half
                results.append(dt_from_gt(g, score=0.9))
    f = tmp_path / 'gt.json'
    f.write_text(json.dumps({'images': images, 'annotations': annotations,
                             'categories': [{'id': 1, 'name': 'person'}]}))

    # full-set metric is deflated by the 4 unevaluated images
    full = evaluate_coco_keypoints(str(f), results, COCO_PERSON_SIGMAS)
    assert full['AP'] < 0.6, full

    # restricted to the evaluated ids: perfect
    sub = evaluate_coco_keypoints(str(f), results, COCO_PERSON_SIGMAS,
                                  image_ids=[1, 2, 3, 4])
    assert abs(sub['AP'] - 1.0) < 1e-6, sub

    # equivalence oracle: physically filtering the GT file gives the same
    filt = {'images': images[:4],
            'annotations': [a for a in annotations if a['image_id'] <= 4],
            'categories': [{'id': 1, 'name': 'person'}]}
    f2 = tmp_path / 'gt4.json'
    f2.write_text(json.dumps(filt))
    phys = evaluate_coco_keypoints(str(f2), results, COCO_PERSON_SIGMAS)
    for k in sub:
        assert abs(sub[k] - phys[k]) < 1e-9, (k, sub[k], phys[k])

    # stray detections outside image_ids are dropped, like COCOeval imgIds
    noise = results + [dt_from_gt(annotations[-1], score=0.95)]
    sub2 = evaluate_coco_keypoints(str(f), noise, COCO_PERSON_SIGMAS,
                                   image_ids=[1, 2, 3, 4])
    for k in sub:
        assert abs(sub2[k] - sub[k]) < 1e-9, (k, sub2[k], sub[k])
