"""Hard synthetic COCO-style keypoint benchmark generator.

The strongest AP-parity proxy available offline (no COCO val2017 in this
environment): scenes with COCO-like scale statistics, overlapping pairs,
border-truncated people, occlusion-marked keypoints and crowd regions.
Feeding its GT through encode->decode (tools/simulate.py, the reference's
utils/simulate.py oracle) measures the ceiling of the encoding scheme under
realistic difficulty; a trained network can never beat that ceiling.

Deterministic for a given seed. Person geometry derives from an upright
17-keypoint template with per-person anisotropic scaling, rotation, mirroring
and per-keypoint jitter.
"""
from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

# upright stick figure in a 1x1 box (x, y), COCO keypoint order
TEMPLATE = np.array([
    [0.50, 0.07], [0.46, 0.05], [0.54, 0.05], [0.42, 0.07], [0.58, 0.07],
    [0.36, 0.22], [0.64, 0.22], [0.32, 0.40], [0.68, 0.40], [0.30, 0.57],
    [0.70, 0.57], [0.41, 0.54], [0.59, 0.54], [0.40, 0.75], [0.60, 0.75],
    [0.39, 0.95], [0.61, 0.95]], dtype=np.float32)

# limb pairs used only for painting the figures into the image pixels
DRAW_LIMBS = ((5, 7), (7, 9), (6, 8), (8, 10), (5, 6), (11, 12), (5, 11),
              (6, 12), (11, 13), (13, 15), (12, 14), (14, 16), (0, 5), (0, 6))

SIZES = ((480, 640), (640, 480), (640, 640), (427, 640), (640, 427))


def _make_person(rng, h, w, box):
    """One (17, 3) person at a random position; may be border-truncated."""
    # anisotropic squeeze + rotation + optional mirror
    kps = TEMPLATE.copy()
    if rng.rand() < 0.5:
        kps[:, 0] = 1.0 - kps[:, 0]
    sx = box * (0.75 + 0.5 * rng.rand())
    sy = box * (0.85 + 0.3 * rng.rand())
    ang = (rng.rand() - 0.5) * 0.6            # up to ~17 degrees
    ca, sa = np.cos(ang), np.sin(ang)
    x = (kps[:, 0] - 0.5) * sx
    y = (kps[:, 1] - 0.5) * sy
    rx, ry = ca * x - sa * y, sa * x + ca * y
    # allow centers near borders -> truncation
    cx = rng.uniform(-0.15 * box, w - 1 + 0.15 * box)
    cy = rng.uniform(-0.15 * box, h - 1 + 0.15 * box)
    out = np.zeros((17, 3), np.float32)
    out[:, 0] = cx + rx + rng.randn(17) * box * 0.012
    out[:, 1] = cy + ry + rng.randn(17) * box * 0.012
    inside = ((out[:, 0] >= 0) & (out[:, 0] <= w - 1)
              & (out[:, 1] >= 0) & (out[:, 1] <= h - 1))
    # v=2 visible, v=1 labeled-but-occluded (random 15%), v=0 outside image
    v = np.where(rng.rand(17) < 0.15, 1, 2).astype(np.float32)
    out[:, 2] = np.where(inside, v, 0.0)
    out[~inside, :2] = 0.0
    return out


def _paint(img, kps):
    import cv2
    for a, b in DRAW_LIMBS:
        if kps[a, 2] > 0 and kps[b, 2] > 0:
            cv2.line(img, tuple(kps[a, :2].astype(int)),
                     tuple(kps[b, :2].astype(int)), (210, 60, 60), 2)
    for j in range(17):
        if kps[j, 2] > 0:
            cv2.circle(img, tuple(kps[j, :2].astype(int)), 3,
                       (60, 200, 60), -1)
    return img


def make_hard_dataset(root: str, n_images: int = 100, seed: int = 0,
                      paint: bool = True) -> Tuple[str, str]:
    """Generate the benchmark; returns (image_dir, annotation_file)."""
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        h, w = SIZES[rng.randint(len(SIZES))]
        img = (rng.rand(h, w, 3) * 60 + 70).astype(np.uint8)
        persons: List[np.ndarray] = []
        n_base = 1 + rng.randint(8)
        for _ in range(n_base):
            # log-uniform scale over the COCO-relevant range
            box = float(np.exp(rng.uniform(np.log(36.0), np.log(440.0))))
            box = min(box, 1.1 * min(h, w))
            kps = _make_person(rng, h, w, box)
            persons.append(kps)
            # overlapping partner at a similar scale
            if rng.rand() < 0.35 and len(persons) < 14:
                partner = kps.copy()
                ok = partner[:, 2] > 0
                dx = box * rng.uniform(0.2, 0.5) * rng.choice([-1, 1])
                dy = box * rng.uniform(-0.2, 0.2)
                partner[ok, 0] += dx
                partner[ok, 1] += dy
                inside = ((partner[:, 0] >= 0) & (partner[:, 0] <= w - 1)
                          & (partner[:, 1] >= 0) & (partner[:, 1] <= h - 1)
                          & ok)
                partner[:, 2] = np.where(inside, partner[:, 2], 0.0)
                partner[~inside, :2] = 0.0
                persons.append(partner)

        for kps in persons:
            n_vis = int((kps[:, 2] > 0).sum())
            if n_vis < 3:
                continue
            pos = kps[kps[:, 2] > 0]
            bx, by = pos[:, 0].min() - 3, pos[:, 1].min() - 3
            bw = pos[:, 0].max() - pos[:, 0].min() + 6
            bh = pos[:, 1].max() - pos[:, 1].min() + 6
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'keypoints': kps.reshape(-1).tolist(),
                'num_keypoints': n_vis, 'iscrowd': 0,
                'bbox': [float(bx), float(by), float(bw), float(bh)],
                'area': float(bw * bh * 0.55),
                'segmentation': [[float(bx), float(by), float(bx + bw),
                                  float(by), float(bx + bw), float(by + bh),
                                  float(bx), float(by + bh)]],
            })
            ann_id += 1
            if paint:
                _paint(img, kps)

        # unannotated crowd region (training-mask semantics; evaluators
        # treat iscrowd GT as non-scoring)
        if rng.rand() < 0.25:
            cw, ch = rng.uniform(60, 200), rng.uniform(60, 200)
            cx = rng.uniform(0, max(w - cw, 1))
            cy = rng.uniform(0, max(h - ch, 1))
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'keypoints': [0.0] * 51, 'num_keypoints': 0, 'iscrowd': 1,
                'bbox': [float(cx), float(cy), float(cw), float(ch)],
                'area': float(cw * ch),
                'segmentation': [[float(cx), float(cy), float(cx + cw),
                                  float(cy), float(cx + cw), float(cy + ch),
                                  float(cx), float(cy + ch)]],
            })
            ann_id += 1

        name = f'{img_id:06d}.jpg'
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({'id': img_id, 'file_name': name,
                       'height': int(h), 'width': int(w)})

    from ..config import COCO_KEYPOINTS, COCO_PERSON_SKELETON
    ann_file = os.path.join(root, 'annotations.json')
    with open(ann_file, 'w') as f:
        # standard COCO category record (keypoint NAMES + 1-based skeleton) so
        # the file also works with external pycocotools-based tooling
        json.dump({'images': images, 'annotations': annotations,
                   'categories': [{
                       'id': 1, 'name': 'person',
                       'keypoints': list(COCO_KEYPOINTS),
                       'skeleton': [[a + 1, b + 1]
                                    for a, b in COCO_PERSON_SKELETON]}]}, f)
    return img_dir, ann_file


def make_crowd_dataset(root: str, n_images: int = 30, seed: int = 0,
                       n_persons: Tuple[int, int] = (50, 70),
                       paint: bool = True) -> Tuple[str, str]:
    """Crowd-scale stress scenes: `n_persons` people per 640^2 image at
    small-to-medium scales with heavy mutual overlap — the regime where the
    decoder's fixed-shape capacities (`DecoderConfig.capacity`,
    `max_poses`, `topk`) bound subset growth, unlike the reference's
    unbounded python list (/root/reference/decoder/group.py:166-177).
    Returns (image_dir, annotation_file)."""
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        h = w = 640
        img = (rng.rand(h, w, 3) * 60 + 70).astype(np.uint8)
        n_p = rng.randint(n_persons[0], n_persons[1] + 1)
        for _ in range(n_p):
            box = float(np.exp(rng.uniform(np.log(40.0), np.log(150.0))))
            kps = _make_person(rng, h, w, box)
            n_vis = int((kps[:, 2] > 0).sum())
            if n_vis < 3:
                continue
            pos = kps[kps[:, 2] > 0]
            bx, by = pos[:, 0].min() - 3, pos[:, 1].min() - 3
            bw = pos[:, 0].max() - pos[:, 0].min() + 6
            bh = pos[:, 1].max() - pos[:, 1].min() + 6
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'keypoints': kps.reshape(-1).tolist(),
                'num_keypoints': n_vis, 'iscrowd': 0,
                'bbox': [float(bx), float(by), float(bw), float(bh)],
                'area': float(bw * bh * 0.55),
                'segmentation': [[float(bx), float(by), float(bx + bw),
                                  float(by), float(bx + bw), float(by + bh),
                                  float(bx), float(by + bh)]],
            })
            ann_id += 1
            if paint:
                _paint(img, kps)
        name = f'{img_id:06d}.jpg'
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({'id': img_id, 'file_name': name,
                       'height': int(h), 'width': int(w)})

    from ..config import COCO_KEYPOINTS, COCO_PERSON_SKELETON
    ann_file = os.path.join(root, 'annotations.json')
    with open(ann_file, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': [{
                       'id': 1, 'name': 'person',
                       'keypoints': list(COCO_KEYPOINTS),
                       'skeleton': [[a + 1, b + 1]
                                    for a, b in COCO_PERSON_SKELETON]}]}, f)
    return img_dir, ann_file


if __name__ == '__main__':
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('out_dir')
    p.add_argument('--n-images', type=int, default=100)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--crowd', default=None,
                   help='MIN,MAX persons per image: generate the crowd '
                        'stress set instead of the hard benchmark')
    a = p.parse_args()
    if a.crowd:
        lo, hi = (int(x) for x in a.crowd.split(','))
        img_dir, ann_file = make_crowd_dataset(a.out_dir, a.n_images, a.seed,
                                               n_persons=(lo, hi))
    else:
        img_dir, ann_file = make_hard_dataset(a.out_dir, a.n_images, a.seed)
    print(img_dir)
    print(ann_file)
