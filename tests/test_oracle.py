"""Oracle round-trip: encoder GT -> decoder -> recovered poses.

TPU port of the reference's oracle simulation harness (utils/simulate.py),
which feeds ground-truth heatmaps/offsets straight into the decoder and checks
the encode->decode scheme end-to-end without any network.
"""
import numpy as np
import jax.numpy as jnp

from offsetguided_tpu.config import COCO_PERSON_SIGMAS, COCO_PERSON_SKELETON
from offsetguided_tpu.config.defaults import DecoderConfig, EncoderConfig
from offsetguided_tpu.decoder import PostProcessor
from offsetguided_tpu.ops.encoder import encode_targets

J = 17

# upright stick figure in a 1x1 box (x, y), COCO keypoint order
TEMPLATE = np.array([
    [0.50, 0.07], [0.46, 0.05], [0.54, 0.05], [0.42, 0.07], [0.58, 0.07],
    [0.36, 0.22], [0.64, 0.22], [0.32, 0.40], [0.68, 0.40], [0.30, 0.57],
    [0.70, 0.57], [0.41, 0.54], [0.59, 0.54], [0.40, 0.75], [0.60, 0.75],
    [0.39, 0.95], [0.61, 0.95]], dtype=np.float32)


def make_scene(offsets_and_sizes, img=256):
    """Place persons at (x0, y0, box) positions; returns (P, 17, 4) anns.

    Coordinates get a small deterministic perturbation to break the exact
    mirror symmetry of the template: perfectly symmetric Gaussians produce
    *tied* duplicate NMS peaks (a measure-zero event on real data) which the
    reference decoder suffers from as well.
    """
    jig = np.random.RandomState(7)
    anns = np.zeros((len(offsets_and_sizes), J, 4), np.float32)
    for i, (x0, y0, box) in enumerate(offsets_and_sizes):
        anns[i, :, 0] = x0 + TEMPLATE[:, 0] * box + jig.rand(J) * 0.73
        anns[i, :, 1] = y0 + TEMPLATE[:, 1] * box + jig.rand(J) * 0.73
        anns[i, :, 2] = 2.0
        anns[i, :, 3] = box * np.asarray(COCO_PERSON_SIGMAS)
    return anns


def run_oracle(anns, img=256, upsampled=True, use_jitter=True):
    enc_cfg = EncoderConfig(max_persons=max(4, len(anns)))
    t = encode_targets(jnp.asarray(anns[None]), np.asarray(COCO_PERSON_SIGMAS),
                       COCO_PERSON_SKELETON, img // 4, img // 4, enc_cfg)
    preds = {
        'hmp': [t.hmp], 'bg': [None],
        'jomp': [t.jomp if use_jitter else None],
        'omp': [t.omp], 'spread': [None], 'scmp': [None],
    }
    pp = PostProcessor(cfg=DecoderConfig(
        topk=16, thre_hmp=0.1, dist_max=40.0, use_scale=False,
        person_thre=0.2, max_poses=8, upsampled_decode=upsampled,
        use_jitter_offset=use_jitter))
    poses, scores, counts = pp.decode(preds, flip_test=False)
    return np.asarray(poses[0]), np.asarray(scores[0]), int(counts[0])


def check_recovery(anns, poses, count, tol):
    assert count == len(anns), (count, len(anns))
    used = set()
    for p in range(len(anns)):
        # match recovered pose by nearest mean position
        gt_mean = anns[p, :, :2].mean(0)
        dists = [np.linalg.norm(poses[m, :, :2].mean(0) - gt_mean)
                 for m in range(count)]
        m = int(np.argmin(dists))
        assert m not in used
        used.add(m)
        err = np.linalg.norm(poses[m, :, :2] - anns[p, :, :2], axis=-1)
        assert err.max() < tol, (p, err.max())


def test_single_person_roundtrip():
    anns = make_scene([(60, 40, 150)])
    poses, scores, count = run_oracle(anns, upsampled=True)
    check_recovery(anns, poses, count, tol=2.1)


def test_three_persons_roundtrip():
    anns = make_scene([(10, 30, 120), (130, 60, 100), (90, 10, 80)])
    poses, scores, count = run_oracle(anns, upsampled=True)
    check_recovery(anns, poses, count, tol=2.1)


def test_lowres_decode_roundtrip():
    """The fast stride-resolution decode must recover poses via jitter offsets."""
    anns = make_scene([(20, 30, 140), (140, 70, 90)])
    poses, scores, count = run_oracle(anns, upsampled=False, use_jitter=True)
    check_recovery(anns, poses, count, tol=2.1)


def test_lowres_decode_without_jitter_is_coarser():
    anns = make_scene([(20, 30, 140)])
    poses, scores, count = run_oracle(anns, upsampled=False, use_jitter=False)
    # without jitter refinement localization is limited by the stride
    check_recovery(anns, poses, count, tol=4.0)
