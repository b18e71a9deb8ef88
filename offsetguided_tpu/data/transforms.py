"""Host-side geometric + photometric transforms (NumPy/cv2).

Functional re-design of the reference transforms package (transforms/): every
transform maps `(image, anns, meta, mask_miss) -> (image, anns, meta,
mask_miss)` where `anns` is an `(P, J, 4)` float array of (x, y, v, scale) and
`meta` is a dict carrying the forward mapping for later inversion
(transforms/annotations.py:71-84). Coordinate conventions are kept bit-equal
with the reference:
- rescaling uses `(target-1)/(orig-1)` scale factors (transforms/scale.py:37-41),
- the train-time augmentation composes ONE 3x3 affine
  center2center @ zero2center @ flip @ scale @ rotate @ center2zero
  (transforms/affine.py:229-278) applied with cv2.warpAffine,
- padding fills RGB(124,116,104) and records offsets in meta.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..config import DATA_MEAN, DATA_STD
from ..config.defaults import AugmentationConfig

PAD_RGB = (124, 116, 104)


def make_meta(w: int, h: int, n_keypoints: int = 17) -> Dict:
    return {
        'joint_num': n_keypoints,
        'offset': np.array([0.0, 0.0]),
        'scale': np.array([1.0, 1.0]),
        'valid_area': np.array([0.0, 0.0, float(w), float(h)]),
        'hflip': False,
        'rotate': 0.0,
        'width_height': np.array([w, h]),
        'original_width_height': np.array([w, h]),
        'affine_mat': np.eye(3, dtype=np.float32),
        'joint_channel_ind': np.arange(n_keypoints),
    }


def normalize_annotations(coco_anns: List[Dict], sigmas,
                          n_keypoints: int = 17) -> np.ndarray:
    """COCO ann dicts -> (P, J, 4) with per-keypoint scale = sqrt(bbox area) *
    OKS sigma (transforms/annotations.py:40-63)."""
    anns = [a for a in coco_anns
            if not a.get('iscrowd') and a.get('num_keypoints', 0) > 0]
    out = np.zeros((len(anns), n_keypoints, 4), dtype=np.float32)
    sig = np.asarray(sigmas, dtype=np.float32)
    for i, a in enumerate(anns):
        out[i, :, :3] = np.asarray(a['keypoints'],
                                   dtype=np.float32).reshape(-1, 3)
        scale = math.sqrt(max(a['bbox'][2] * a['bbox'][3], 0.0))
        out[i, :, 3] = scale * sig
        if a.get('area', 1e9) <= 32 * 32:
            out[i, :, 2] = 0
    return out


def annotation_jitter(anns: np.ndarray, rng: np.random.RandomState,
                      epsilon: float = 0.5) -> np.ndarray:
    """+-epsilon/2-uniform coordinate jitter (transforms/annotations.py:89-111)."""
    anns = anns.copy()
    anns[:, :, :2] += epsilon * (rng.rand(*anns[:, :, :2].shape) - 0.5) * 2.0
    return anns


# --------------------------------------------------------------------------- #
# eval-time rescale + pad
# --------------------------------------------------------------------------- #

def _scale_to(image, anns, meta, target_w, target_h,
              interpolation=cv2.INTER_CUBIC):
    h, w = image.shape[:2]
    image = cv2.resize(image, (target_w, target_h), interpolation=interpolation)
    x_scale = (target_w - 1) / (w - 1)
    y_scale = (target_h - 1) / (h - 1)
    anns = anns.copy()
    anns[:, :, 0] *= x_scale
    anns[:, :, 1] *= y_scale
    anns[:, :, 3] *= math.sqrt(x_scale * y_scale)
    meta = dict(meta)
    sf = np.array([x_scale, y_scale])
    meta['offset'] = meta['offset'] * sf
    meta['scale'] = meta['scale'] * sf
    meta['width_height'] = np.array([target_w, target_h])
    va = meta['valid_area'].copy()
    va[:2] *= sf
    va[2:] *= sf
    meta['valid_area'] = va
    return image, anns, meta


def rescale_long_absolute(image, anns, meta, long_edge: int):
    """Resize so the longer edge equals long_edge (transforms/scale.py:75-100)."""
    h, w = image.shape[:2]
    s = long_edge / max(h, w)
    if h > w:
        tw, th = int(w * s), long_edge
    else:
        tw, th = long_edge, int(h * s)
    return _scale_to(image, anns, meta, tw, th)


def rescale_high_absolute(image, anns, meta, height_edge: int):
    """Resize to a fixed height (transforms/scale.py:103-121)."""
    h, w = image.shape[:2]
    s = height_edge / h
    return _scale_to(image, anns, meta, int(w * s), int(height_edge))


def rescale_relative(image, anns, meta, scale_factor: float):
    """Resize by a relative factor (transforms/scale.py:124-136)."""
    h, w = image.shape[:2]
    return _scale_to(image, anns, meta,
                     int(w * scale_factor), int(h * scale_factor))


def center_pad(image, anns, meta, target_size: int):
    """Pad centered to (target, target) (transforms/pad.py:13-62)."""
    h, w = image.shape[:2]
    left = max((target_size - w) // 2, 0)
    top = max((target_size - h) // 2, 0)
    right = max(target_size - w - left, 0)
    bottom = max(target_size - h - top, 0)
    image = cv2.copyMakeBorder(image, top, bottom, left, right,
                               cv2.BORDER_CONSTANT, value=PAD_RGB)
    anns = anns.copy()
    anns[:, :, 0] += left
    anns[:, :, 1] += top
    meta = dict(meta)
    meta['offset'] = meta['offset'] - np.array([left, top])
    meta['width_height'] = np.array([image.shape[1], image.shape[0]])
    va = meta['valid_area'].copy()
    va[:2] += np.array([left, top])
    meta['valid_area'] = va
    return image, anns, meta


def square_pad(image, anns, meta):
    """Center-pad to a square of the longer edge (transforms/pad.py:63-70)."""
    return center_pad(image, anns, meta, max(image.shape[:2]))


def rightdown_pad(image, anns, meta, max_stride: int,
                  w_multiple: int = None):
    """Pad right/bottom to a multiple of max_stride (transforms/pad.py:71-122).

    `w_multiple` overrides the width multiple only (fixed-height eval pads
    widths to coarse buckets while the height keeps max_stride padding)."""
    h, w = image.shape[:2]
    wm = w_multiple or max_stride
    bottom = (max_stride - h % max_stride) % max_stride
    right = (wm - w % wm) % wm
    image = cv2.copyMakeBorder(image, 0, bottom, 0, right,
                               cv2.BORDER_CONSTANT, value=PAD_RGB)
    meta = dict(meta)
    meta['width_height'] = np.array([image.shape[1], image.shape[0]])
    return image, anns.copy(), meta


# --------------------------------------------------------------------------- #
# train-time warp affine augmentation
# --------------------------------------------------------------------------- #

def _roi_center(anns, meta):
    vis = anns[:, :, 2] > 0
    if not len(anns) or not vis.any():
        return meta['width_height'].astype(np.float32) // 2
    xs = anns[:, :, 0][vis]
    ys = anns[:, :, 1][vis]
    return np.array([(xs.min() + xs.max()) // 2,
                     (ys.min() + ys.max()) // 2], dtype=np.float32)


def sample_affine_params(aug: AugmentationConfig, rng: np.random.RandomState):
    return dict(
        flip=bool(rng.rand() < aug.flip_prob),
        rotate=float((rng.rand() * 2 - 1) * aug.max_rotate),
        scale=float(aug.min_scale + (aug.max_scale - aug.min_scale) * rng.rand()),
        x_stretch=float(aug.min_stretch
                        + (aug.max_stretch - aug.min_stretch) * rng.rand()),
        y_stretch=float(aug.min_stretch
                        + (aug.max_stretch - aug.min_stretch) * rng.rand()),
        x_offset=int((rng.rand() * 2 - 1) * aug.max_translate),
        y_offset=int((rng.rand() * 2 - 1) * aug.max_translate),
    )


IDENTITY_PARAMS = dict(flip=False, rotate=0.0, scale=1.0, x_stretch=1.0,
                       y_stretch=1.0, x_offset=0, y_offset=0)


def build_affine_mat(params: Dict, roi_center, src_wh, dst_wh,
                     crop_roi: bool = True) -> Tuple[np.ndarray, float, float]:
    """One 3x3 matrix composing flip/scale/rotate/translate
    (transforms/affine.py:229-278)."""
    cangle = math.cos(math.radians(params['rotate']))
    sangle = math.sin(math.radians(params['rotate']))
    scale_x = params['x_stretch'] * params['scale']
    scale_y = params['y_stretch'] * params['scale']

    center = (np.asarray(src_wh, dtype=np.float32) - 1) / 2
    move2roi = center - roi_center
    tx = params['x_offset'] + (move2roi[0] * scale_x if crop_roi else 0)
    ty = params['y_offset'] + (move2roi[1] * scale_y if crop_roi else 0)

    center2zero = np.array([[1, 0, -center[0]], [0, 1, -center[1]], [0, 0, 1]])
    rotate = np.array([[cangle, sangle, 0], [-sangle, cangle, 0], [0, 0, 1]])
    scale = np.array([[scale_x, 0, 0], [0, scale_y, 0], [0, 0, 1]])
    flip = np.array([[-1.0 if params['flip'] else 1.0, 0, 0], [0, 1, 0],
                     [0, 0, 1]])
    zero2center = np.array([[1, 0, (dst_wh[0] - 1) / 2],
                            [0, 1, (dst_wh[1] - 1) / 2], [0, 0, 1]])
    center2center = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]])

    mat = center2center @ zero2center @ flip @ scale @ rotate @ center2zero
    return mat.astype(np.float64), scale_x, scale_y


def warp_affine(image, anns, meta, mask_miss, params: Dict, dst_size: int,
                left_index, right_index, crop_roi: bool = True):
    """Apply the sampled affine to image/anns/mask (transforms/affine.py:107-227)."""
    in_size = [dst_size, dst_size]
    roi_center = _roi_center(anns, meta)
    mat, scale_x, scale_y = build_affine_mat(
        params, roi_center, meta['width_height'], in_size, crop_roi)
    M = mat[:2]

    image = cv2.warpAffine(image, M, (in_size[1], in_size[0]),
                           flags=cv2.INTER_CUBIC,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=PAD_RGB)
    if mask_miss is not None:
        mask_miss = cv2.warpAffine(mask_miss, M, (in_size[1], in_size[0]),
                                   flags=cv2.INTER_CUBIC,
                                   borderMode=cv2.BORDER_CONSTANT,
                                   borderValue=255)

    anns = anns.copy()
    if len(anns):
        homo = np.concatenate(
            [anns[:, :, :2], np.ones_like(anns[:, :, :1])], axis=-1)
        anns[:, :, :2] = np.einsum('ij,pkj->pki', M, homo)
        anns[:, :, 3] *= math.sqrt(scale_x * scale_y)

    meta = dict(meta)
    left_index, right_index = list(left_index), list(right_index)
    if params['flip'] and len(anns):
        tmp_l = anns[:, left_index, :].copy()
        anns[:, left_index, :] = anns[:, right_index, :]
        anns[:, right_index, :] = tmp_l
        jci = meta['joint_channel_ind'].copy()
        jci[left_index] = right_index
        jci[right_index] = left_index
        meta['joint_channel_ind'] = jci

    if len(anns):
        # invalidate keypoints warped off the canvas (transforms/affine.py:216-226)
        off = ((anns[:, :, 0] <= 0) | (anns[:, :, 1] <= 0)
               | (anns[:, :, 0] > in_size[0]) | (anns[:, :, 1] > in_size[1]))
        anns[:, :, 2] = np.where(off, 0.0, anns[:, :, 2])

    meta['hflip'] = bool(params['flip'])
    meta['scale'] = meta['scale'] * np.array([scale_x, scale_y])
    meta['rotate'] = meta['rotate'] + params['rotate']
    meta['affine_mat'] = mat @ meta['affine_mat']
    meta['width_height'] = np.array(in_size)
    return image, anns, meta, mask_miss


# --------------------------------------------------------------------------- #
# photometric augmentation (transforms/image.py)
# --------------------------------------------------------------------------- #

def to_gray(image: np.ndarray) -> np.ndarray:
    g = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
    return np.repeat(g[:, :, None], 3, axis=2)


def color_tint(image: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Random HSV shifts (transforms/image.py:68-86)."""
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.int32)
    hsv[:, :, 0] = (hsv[:, :, 0] + rng.randint(-10, 11)) % 180
    hsv[:, :, 1] = np.clip(hsv[:, :, 1] + rng.randint(-40, 41), 0, 255)
    hsv[:, :, 2] = np.clip(hsv[:, :, 2] + rng.randint(-30, 31), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def jpeg_compression(image: np.ndarray, rng: np.random.RandomState,
                     quality_range=(50, 95)) -> np.ndarray:
    """Random JPEG re-compression artifact augmentation
    (reference transforms/image.py JpegCompression)."""
    q = int(rng.randint(quality_range[0], quality_range[1] + 1))
    ok, enc = cv2.imencode('.jpg', cv2.cvtColor(image, cv2.COLOR_RGB2BGR),
                           [int(cv2.IMWRITE_JPEG_QUALITY), q])
    if not ok:
        return image
    return cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)


def blur(image: np.ndarray, rng: np.random.RandomState,
         max_sigma: float = 2.0) -> np.ndarray:
    """Random Gaussian blur (reference transforms/image.py Blur)."""
    sigma = 0.3 + rng.rand() * (max_sigma - 0.3)
    return cv2.GaussianBlur(image, (0, 0), sigma)


def normalize_image(image: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32, ImageNet-normalized (transforms/__init__.py:25-35)."""
    img = image.astype(np.float32) / 255.0
    return (img - np.asarray(DATA_MEAN, np.float32)) / np.asarray(
        DATA_STD, np.float32)


# --------------------------------------------------------------------------- #
# combinators (transforms/compose.py, random.py, multi_scale.py)
# --------------------------------------------------------------------------- #

def compose(*fns):
    """Chain transforms of signature (image, anns, meta, mask) -> same tuple
    (reference transforms/compose.py)."""
    def run(image, anns, meta, mask_miss=None):
        for f in fns:
            image, anns, meta, mask_miss = f(image, anns, meta, mask_miss)
        return image, anns, meta, mask_miss
    return run


def random_apply(fn, prob: float, rng: np.random.RandomState):
    """Apply `fn` with probability `prob` (reference transforms/random.py)."""
    def run(image, anns, meta, mask_miss=None):
        if rng.rand() < prob:
            return fn(image, anns, meta, mask_miss)
        return image, anns, meta, mask_miss
    return run


def multi_scale(*pipelines):
    """Fan one sample out to N preprocess pipelines
    (reference transforms/multi_scale.py:4-24; unused by reference entry
    points, provided for capability parity)."""
    def run(image, anns, meta, mask_miss=None):
        return [p(image, anns, meta, mask_miss) for p in pipelines]
    return run


# --------------------------------------------------------------------------- #
# inverse transforms (transforms/preprocess.py:16-63)
# --------------------------------------------------------------------------- #

def annotations_inverse(poses: np.ndarray, meta: Dict) -> np.ndarray:
    """Map decoded poses (M, J, >=4) back to original image coordinates."""
    poses = poses.copy()
    poses[:, :, 0] += meta['offset'][0]
    poses[:, :, 1] += meta['offset'][1]
    poses[:, :, 0] /= meta['scale'][0]
    poses[:, :, 1] /= meta['scale'][1]
    if poses.shape[-1] > 3:
        poses[:, :, 3] /= math.sqrt(float(np.prod(meta['scale'])))
    if meta.get('hflip'):
        raise NotImplementedError('hflip eval preprocessing is not used')
    return poses


def affine_keypoint_inverse(poses: np.ndarray, meta: Dict) -> np.ndarray:
    """Invert the 3x3 train-time affine (transforms/preprocess.py:16-30)."""
    poses = poses.copy()
    Minv = np.linalg.inv(meta['affine_mat'])[:2]
    homo = np.concatenate([poses[:, :, :2], np.ones_like(poses[:, :, :1])],
                          axis=-1)
    poses[:, :, :2] = np.einsum('ij,pkj->pki', Minv, homo)
    if poses.shape[-1] > 3:
        poses[:, :, 3] /= math.sqrt(float(np.prod(meta['scale'])))
    poses = poses[:, meta['joint_channel_ind'], :]
    return poses
