"""Line-faithful transliteration of pycocotools COCOeval (keypoints) as a
TEST-ONLY oracle.

The reference's acceptance metric is pycocotools' COCOeval with
iouType='keypoints' (/root/reference/evaluate.py:303-328). pycocotools is not
available in this environment, so this module re-derives its `computeOks`,
`evaluateImg`, `accumulate` and keypoint summarization step by step from the
published algorithm (cocodataset/cocoapi PythonAPI/pycocotools/cocoeval.py),
preserving its quirks:

- detections sorted by -score with a STABLE sort, truncated to maxDets before
  OKS computation;
- ground truths stably sorted ignored-last; crowd GTs can absorb any number
  of detections; the greedy scan BREAKS at the first ignored gt once a real
  match exists;
- unmatched detections outside the area range are ignored (not FPs);
- precision envelope applied right-to-left, 101-point interpolation via
  searchsorted with the loop aborting at the first out-of-range index
  (pycocotools' bare try/except around the fill loop);
- detection 'area' defaults to the COCO.loadRes keypoint box over ALL
  x[0::3]/y[0::3] positions, zeros included.

This mirrors tests/grouping_strict.py's role for decoder/group.py: a
behavioral port used exclusively as a differential-fuzz oracle
(tests/test_cocoeval_fuzz.py), never by the framework itself.
"""
from __future__ import annotations

import copy

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
# pycocotools Params for keypoints: areaRng all/medium/large, maxDets [20]
AREA_RNGS = [(0.0, 1e10), (32 ** 2, 96 ** 2), (96 ** 2, 1e10)]
MAX_DET = 20


def _compute_oks_matrix(gts, dts, sigmas):
    """pycocotools computeOks: (D, G) OKS, dts pre-sorted/truncated."""
    if len(gts) == 0 or len(dts) == 0:
        return np.zeros((0, 0))
    ious = np.zeros((len(dts), len(gts)))
    sigmas = np.asarray(sigmas, dtype=np.float64)
    variances = (sigmas * 2) ** 2
    k = len(sigmas)
    for j, gt in enumerate(gts):
        g = np.asarray(gt['keypoints'], dtype=np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = np.count_nonzero(vg > 0)
        bb = gt['bbox']
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.asarray(dt['keypoints'], dtype=np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                z = np.zeros((k,))
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
            e = (dx ** 2 + dy ** 2) / variances / (
                gt['area'] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _loadres_area(kps):
    """COCO.loadRes keypoint detection area (all positions, incl. zeros)."""
    s = np.asarray(kps, dtype=np.float64)
    x, y = s[0::3], s[1::3]
    return float((np.max(x) - np.min(x)) * (np.max(y) - np.min(y)))


def _evaluate_img(gts, dts, ious_full, area_rng, max_det):
    """pycocotools evaluateImg for one (image, areaRng, maxDet)."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    gts = copy.deepcopy(gts)
    for g in gts:
        if g['ignore'] or (g['area'] < area_rng[0] or g['area'] > area_rng[1]):
            g['_ignore'] = 1
        else:
            g['_ignore'] = 0
    gtind = np.argsort([g['_ignore'] for g in gts], kind='mergesort')
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d['score'] for d in dts], kind='mergesort')
    dts = [dts[i] for i in dtind[0:max_det]]
    iscrowd = [int(g.get('iscrowd', 0)) for g in gts]
    ious = (ious_full[:, gtind] if len(ious_full) > 0 else ious_full)

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g['_ignore'] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious) != 0:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = m + 1         # gt identity (1-based)
                gtm[tind, m] = dind + 1
    a = np.array([d['area'] < area_rng[0] or d['area'] > area_rng[1]
                  for d in dts]).reshape((1, D))
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        'dtScores': [d['score'] for d in dts],
        'dtMatches': dtm,
        'dtIgnore': dt_ig,
        'gtIgnore': gt_ig,
    }


def _accumulate_one(evals, max_det):
    """pycocotools accumulate for one (areaRng, maxDet) cell ->
    (precision (T, R), recall (T,))."""
    T, R = len(IOU_THRS), len(REC_THRS)
    precision = -np.ones((T, R))
    recall = -np.ones((T,))
    E = [e for e in evals if e is not None]
    if len(E) == 0:
        return precision, recall
    dt_scores = np.concatenate(
        [np.asarray(e['dtScores'][0:max_det]) for e in E])
    inds = np.argsort(-dt_scores, kind='mergesort')
    dtm = np.concatenate([e['dtMatches'][:, 0:max_det] for e in E],
                         axis=1)[:, inds]
    dt_ig = np.concatenate([e['dtIgnore'][:, 0:max_det] for e in E],
                           axis=1)[:, inds]
    gt_ig = np.concatenate([e['gtIgnore'] for e in E])
    npig = np.count_nonzero(gt_ig == 0)
    if npig == 0:
        return precision, recall
    tps = np.logical_and(dtm, np.logical_not(dt_ig))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros((R,))
        recall[t] = rc[-1] if nd else 0
        pr = pr.tolist()
        q = q.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds2 = np.searchsorted(rc, REC_THRS, side='left')
        try:
            for ri, pi in enumerate(inds2):
                q[ri] = pr[pi]
        except IndexError:
            pass
        precision[t] = np.array(q)
    return precision, recall


def evaluate_strict(gts_by_img, dts_by_img, sigmas):
    """Full COCOeval keypoint protocol -> the 10 standard metrics.

    gts_by_img: {image_id: [gt dict]}, gt keys: keypoints (flat 3J),
        area, bbox, iscrowd, num_keypoints, optional ignore.
    dts_by_img: {image_id: [dt dict]}, dt keys: keypoints, score.
    """
    img_ids = sorted(set(gts_by_img) | set(dts_by_img))
    prepared = {}
    for i in img_ids:
        gts = copy.deepcopy(list(gts_by_img.get(i, [])))
        for gt in gts:
            # pycocotools _prepare (keypoints): crowd or keypoint-less GTs
            # are ignore-matchable
            ignore = gt['ignore'] if 'ignore' in gt else 0
            ignore = ignore or ('iscrowd' in gt and gt['iscrowd'])
            gt['ignore'] = (gt['num_keypoints'] == 0) or ignore
        dts = copy.deepcopy(list(dts_by_img.get(i, [])))
        for dt in dts:
            if 'area' not in dt:
                dt['area'] = _loadres_area(dt['keypoints'])
        # computeOks truncates by the largest maxDet before OKS
        dtind = np.argsort([-d['score'] for d in dts], kind='mergesort')
        dts_trunc = [dts[j] for j in dtind]
        if len(dts_trunc) > MAX_DET:
            dts_trunc = dts_trunc[0:MAX_DET]
        ious = _compute_oks_matrix(gts, dts_trunc, sigmas)
        prepared[i] = (gts, dts, ious)

    acc = []
    for rng in AREA_RNGS:
        evals = [_evaluate_img(prepared[i][0], prepared[i][1],
                               prepared[i][2], rng, MAX_DET)
                 for i in img_ids]
        acc.append(_accumulate_one(evals, MAX_DET))

    def _summ(ap, area_idx, thr=None):
        precision, rec = acc[area_idx]
        if ap:
            s = precision if thr is None else \
                precision[np.where(np.isclose(IOU_THRS, thr))[0]]
        else:
            s = rec if thr is None else \
                rec[np.where(np.isclose(IOU_THRS, thr))[0]]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    return {
        'AP': _summ(True, 0), 'AP50': _summ(True, 0, 0.5),
        'AP75': _summ(True, 0, 0.75), 'APm': _summ(True, 1),
        'APl': _summ(True, 2),
        'AR': _summ(False, 0), 'AR50': _summ(False, 0, 0.5),
        'AR75': _summ(False, 0, 0.75), 'ARm': _summ(False, 1),
        'ARl': _summ(False, 2),
    }
