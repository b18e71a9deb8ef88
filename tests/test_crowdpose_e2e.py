"""CrowdPose 14-keypoint end-to-end: GT encoder -> decoder -> inverse
transforms -> crowd-band AP evaluator, plus the flip-test plumbing with the
CrowdPose flip/reserve index tables.

Capability parity with the reference's CrowdPose branch (reference
README.md:133-150 reports AP / AP-easy / AP-medium / AP-hard on the
14-keypoint taxonomy).
"""
import json

import numpy as np
import jax.numpy as jnp
import pytest

from offsetguided_tpu.config.crowdpose import (CROWDPOSE_PERSON_SKELETON,
                                               CROWDPOSE_SIGMAS)
from offsetguided_tpu.config.defaults import (DecoderConfig, EncoderConfig,
                                              SkeletonConfig)
from offsetguided_tpu.decoder import PostProcessor
from offsetguided_tpu.ops.encoder import encode_targets

J = 14

# upright figure in a 1x1 box (x, y), CrowdPose keypoint order:
# shoulders, elbows, wrists, hips, knees, ankles, head_top, neck
TEMPLATE14 = np.array([
    [0.36, 0.22], [0.64, 0.22],   # shoulders
    [0.32, 0.40], [0.68, 0.40],   # elbows
    [0.30, 0.57], [0.70, 0.57],   # wrists
    [0.41, 0.54], [0.59, 0.54],   # hips
    [0.40, 0.75], [0.60, 0.75],   # knees
    [0.39, 0.95], [0.61, 0.95],   # ankles
    [0.50, 0.02],                 # head_top
    [0.50, 0.16],                 # neck
], dtype=np.float32)


def make_persons(offsets_and_sizes, seed=11):
    """(P, 14, 3) keypoints at absolute pixel positions."""
    jig = np.random.RandomState(seed)
    kps = np.zeros((len(offsets_and_sizes), J, 3), np.float32)
    for i, (x0, y0, box) in enumerate(offsets_and_sizes):
        kps[i, :, 0] = x0 + TEMPLATE14[:, 0] * box + jig.rand(J) * 0.73
        kps[i, :, 1] = y0 + TEMPLATE14[:, 1] * box + jig.rand(J) * 0.73
        kps[i, :, 2] = 2
    return kps


@pytest.fixture(scope='module')
def crowdpose_json(tmp_path_factory):
    """Synthetic CrowdPose-style annotation file with per-image crowdIndex
    spanning the three evaluation bands (easy <0.1, medium 0.1..0.8,
    hard >0.8)."""
    root = tmp_path_factory.mktemp('synthcrowdpose')
    scenes = [
        # (crowdIndex, person placements)
        (0.00, [(60, 40, 150)]),
        (0.05, [(20, 30, 140), (170, 60, 120)]),
        (0.40, [(10, 30, 120), (150, 60, 110)]),
        (0.50, [(30, 10, 130), (180, 40, 100)]),
        (0.90, [(20, 20, 140), (110, 40, 130), (210, 30, 90)]),
        (0.95, [(40, 30, 150), (150, 50, 120)]),
    ]
    images, annotations, gt_kps = [], [], {}
    ann_id = 1
    for img_id, (ci, placements) in enumerate(scenes, start=1):
        h, w = 256, 320
        kps = make_persons(placements, seed=img_id)
        gt_kps[img_id] = kps
        for p in range(len(kps)):
            k = kps[p]
            bx, by = k[:, 0].min() - 3, k[:, 1].min() - 3
            bw = k[:, 0].max() - k[:, 0].min() + 6
            bh = k[:, 1].max() - k[:, 1].min() + 6
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'keypoints': k.reshape(-1).tolist(), 'num_keypoints': J,
                'iscrowd': 0,
                'bbox': [float(bx), float(by), float(bw), float(bh)],
                'area': float(bw * bh * 0.6),
            })
            ann_id += 1
        images.append({'id': img_id, 'file_name': f'{img_id:06d}.jpg',
                       'height': h, 'width': w, 'crowdIndex': ci})
    ann = {'images': images, 'annotations': annotations,
           'categories': [{'id': 1, 'name': 'person'}]}
    path = root / 'annotations.json'
    path.write_text(json.dumps(ann))
    return str(path), gt_kps


def _oracle_maps(anns_p4, size):
    """(P, 14, 4) padded anns -> GT prediction dict at stride 4."""
    enc_cfg = EncoderConfig(max_persons=anns_p4.shape[0])
    t = encode_targets(jnp.asarray(anns_p4[None]),
                       np.asarray(CROWDPOSE_SIGMAS),
                       CROWDPOSE_PERSON_SKELETON, size // 4, size // 4,
                       enc_cfg)
    return {'hmp': [t.hmp], 'bg': [None], 'jomp': [t.jomp],
            'omp': [t.omp], 'spread': [None], 'scmp': [None]}


def _postprocessor():
    return PostProcessor(
        skeleton=SkeletonConfig.crowdpose(),
        cfg=DecoderConfig(topk=12, thre_hmp=0.1, dist_max=20.0,
                          use_scale=False, person_thre=0.1, max_poses=8))


def test_crowdpose_oracle_ap_bands(crowdpose_json):
    """Full CrowdPose loop: encode 14-kp GT, decode, invert, crowd-band AP."""
    from offsetguided_tpu.data import transforms as T
    from offsetguided_tpu.data.coco import CocoJson
    from offsetguided_tpu.eval.cocoeval import evaluate_crowdpose_keypoints
    from offsetguided_tpu.eval.harness import poses_to_coco_results

    ann_file, _ = crowdpose_json
    coco = CocoJson(ann_file)
    pp = _postprocessor()
    size = 160

    results = []
    for img_id in coco.image_ids(with_persons=True):
        info = coco.image_info(img_id)
        anns = T.normalize_annotations(coco.anns_for_image(img_id),
                                       CROWDPOSE_SIGMAS, n_keypoints=J)
        meta = T.make_meta(info['width'], info['height'])
        dummy = np.zeros((info['height'], info['width'], 3), np.uint8)
        img2, anns, meta = T.rescale_long_absolute(dummy, anns, meta, size)
        _, anns, meta = T.center_pad(img2, anns, meta, size)
        padded = np.zeros((8, J, 4), np.float32)
        padded[:len(anns)] = anns[:8]
        poses, scores, counts = pp.decode(_oracle_maps(padded, size))
        valid = np.asarray(poses[0])[:int(counts[0])]
        inv = T.annotations_inverse(valid, meta)
        results.extend(poses_to_coco_results(inv, img_id))

    stats = evaluate_crowdpose_keypoints(coco, results,
                                         np.asarray(CROWDPOSE_SIGMAS))
    assert stats['AP'] > 0.85, stats
    # every crowdIndex band is populated and scored
    for band in ('AP_easy', 'AP_medium', 'AP_hard'):
        assert stats[band] > 0.75, stats


def test_crowdpose_flip_merge_roundtrip():
    """Decode with flip_test=True on an exactly-constructed flipped half-batch
    must reproduce the non-flip decode: exercises the CrowdPose kp/limb flip
    permutations and the reserve (direction-reversed limb) rule end to end."""
    size = 160
    anns = np.zeros((8, J, 4), np.float32)
    kps = make_persons([(20, 30, 100), (85, 45, 60)], seed=3)
    anns[:2, :, :3] = kps
    anns[:2, :, 3] = 2.0
    pp = _postprocessor()
    maps = _oracle_maps(anns, size)

    kp_flip = list(pp._kp_flip)
    limb_flip = list(pp._limb_flip)
    L = len(limb_flip)

    def flipped(x, kind):
        f = jnp.flip(x, axis=2)
        if kind == 'hmp':
            # channel c of the flipped image's prediction is the unflipped
            # prediction's channel kp_flip[c]; kp_flip is an involution
            return f[..., kp_flip]
        if kind == 'jomp':
            return f.at[..., 0].multiply(-1.0)
        assert kind == 'omp'
        n, h, w, _ = f.shape
        f5 = f.reshape(n, h, w, L, 2).at[..., 0].multiply(-1.0)
        return f5[..., limb_flip, :].reshape(n, h, w, 2 * L)

    doubled = {
        'hmp': [jnp.concatenate([maps['hmp'][0],
                                 flipped(maps['hmp'][0], 'hmp')])],
        'jomp': [jnp.concatenate([maps['jomp'][0],
                                  flipped(maps['jomp'][0], 'jomp')])],
        'omp': [jnp.concatenate([maps['omp'][0],
                                 flipped(maps['omp'][0], 'omp')])],
        'bg': [None], 'spread': [None], 'scmp': [None],
    }

    poses_ref, _, counts_ref = pp.decode(maps, flip_test=False)
    poses_flip, _, counts_flip = pp.decode(doubled, flip_test=True)
    assert int(counts_flip[0]) == int(counts_ref[0]) == 2
    a = np.asarray(poses_ref[0])[:2]
    b = np.asarray(poses_flip[0])[:2]
    # reserve limbs keep the original prediction, everything else averages
    # two identical copies -> positions must agree to float tolerance
    np.testing.assert_allclose(b[..., :2], a[..., :2], atol=1e-3)


def test_crowdpose_evaluate_tool_from_disk(crowdpose_json, tmp_path, capsys,
                                           monkeypatch):
    """tools/evaluate.py --dataset crowdpose end-to-end over an ON-DISK
    synthetic CrowdPose set (images + per-image crowdIndex): the tool must
    run the full from-disk harness and report the crowd-band protocol
    (AP / AP_easy / AP_medium / AP_hard, reference README.md:133-150)."""
    import os
    import sys
    import cv2
    import importlib
    from offsetguided_tpu.data.coco import CocoJson

    ann_file, gt_kps = crowdpose_json
    # paint the annotated scenes to JPEGs next to the annotation file
    img_dir = os.path.join(os.path.dirname(ann_file), 'images')
    os.makedirs(img_dir, exist_ok=True)
    coco = CocoJson(ann_file)
    for img_id in coco.image_ids():
        info = coco.image_info(img_id)
        img = np.full((info['height'], info['width'], 3), 90, np.uint8)
        for k in gt_kps[img_id]:
            for x, y, v in k:
                if v > 0:
                    cv2.circle(img, (int(x), int(y)), 3, (60, 200, 60), -1)
        cv2.imwrite(os.path.join(img_dir, info['file_name']), img)

    sys.path.insert(0, 'tools')
    ev = importlib.import_module('evaluate')
    out = tmp_path / 'cp_res.json'
    ev.main(['--image-dir', img_dir, '--annotation-file', ann_file,
             '--dataset', 'crowdpose', '--long-edge', '128',
             '--batch-size', '2', '--debug-tiny-model',
             '--results-json', str(out)])
    printed = capsys.readouterr().out
    for key in ('AP:', 'AP_easy:', 'AP_medium:', 'AP_hard:'):
        assert key in printed, f'missing {key} in tool output:\n{printed}'
    res = json.loads(out.read_text())
    assert len(res) >= len(coco.image_ids(with_persons=True))
    assert all(len(r['keypoints']) == J * 3 for r in res)
