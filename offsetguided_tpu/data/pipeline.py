"""Training/eval dataset + batching (host side, torch-free).

The reference uses torch DataLoader workers running the full per-sample
transform+encode pipeline (data/dataset.py:87-131). Here the host only does
image IO + geometric/photometric augmentation (cv2) and pads annotations to a
fixed `(max_persons, J, 4)` tensor; the heavy GT rendering runs batched on
device (ops/encoder.py). A background thread prefetches batches.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np

from ..config.defaults import AugmentationConfig, SkeletonConfig
from . import transforms as T
from .coco import CocoJson, build_miss_masks


class CocoKeypoints:
    """COCO keypoint dataset (reference data/dataset.py:14-197).

    `get(i, rng)` returns a dict with fixed-shape arrays ready for device
    transfer: image (S, S, 3) float32, anns (P, J, 4), mask_miss (S, S)
    float32 in [0, 1], plus meta.
    """

    def __init__(self, image_dir: str, ann_file: str, *,
                 skeleton: SkeletonConfig = SkeletonConfig(),
                 aug: Optional[AugmentationConfig] = AugmentationConfig(),
                 square_length: int = 512, max_persons: int = 32,
                 n_images: Optional[int] = None, all_persons: bool = False):
        self.coco = CocoJson(ann_file)
        self.image_dir = image_dir
        self.skeleton = skeleton
        self.aug = aug
        self.square = square_length
        self.max_persons = max_persons
        self.left_index = [i for i, n in enumerate(skeleton.keypoints)
                           if n.startswith('left')]
        self.right_index = [i for i, n in enumerate(skeleton.keypoints)
                            if n.startswith('right')]
        self.ids = self.coco.image_ids(with_persons=True,
                                       with_keypoints=not all_persons)
        if n_images:
            self.ids = self.ids[:n_images]

    def __len__(self):
        return len(self.ids)

    def _pad_persons(self, anns: np.ndarray) -> np.ndarray:
        J = self.skeleton.n_keypoints
        out = np.zeros((self.max_persons, J, 4), dtype=np.float32)
        p = min(len(anns), self.max_persons)
        out[:p] = anns[:p]
        return out

    def get(self, index: int, rng: np.random.RandomState) -> Dict:
        img_id = self.ids[index]
        info = self.coco.image_info(img_id)
        path = os.path.join(self.image_dir, info['file_name'])
        image = cv2.imread(path)
        if image is None:
            raise IOError(f'missing image: {path}')
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        coco_anns = self.coco.anns_for_image(img_id)
        mask_miss, _ = build_miss_masks(coco_anns, info['height'],
                                        info['width'])
        anns = T.normalize_annotations(coco_anns, self.skeleton.sigmas,
                                       self.skeleton.n_keypoints)
        meta = T.make_meta(info['width'], info['height'],
                           self.skeleton.n_keypoints)
        meta['image_id'] = img_id

        if self.aug is not None:
            if rng.rand() < self.aug.annotation_jitter_prob:
                anns = T.annotation_jitter(anns, rng)
            params = T.sample_affine_params(self.aug, rng)
            image, anns, meta, mask_miss = T.warp_affine(
                image, anns, meta, mask_miss, params, self.square,
                self.left_index, self.right_index)
            if rng.rand() < self.aug.gray_prob:
                image = T.to_gray(image)
            if rng.rand() < self.aug.color_tint_prob:
                image = T.color_tint(image, rng)
        else:
            params = T.IDENTITY_PARAMS
            image, anns, meta, mask_miss = T.warp_affine(
                image, anns, meta, mask_miss, params, self.square,
                self.left_index, self.right_index)

        return {
            'image': T.normalize_image(image),
            'anns': self._pad_persons(anns),
            'mask_miss': (mask_miss.astype(np.float32) / 255.0
                          if mask_miss is not None
                          else np.ones(image.shape[:2], np.float32)),
            'meta': meta,
        }


class ImageList:
    """Inference-only dataset over a list of image paths
    (reference data/dataset.py:200-227)."""

    def __init__(self, image_paths):
        self.image_paths = list(image_paths)

    def __len__(self):
        return len(self.image_paths)

    def get(self, index: int):
        path = self.image_paths[index]
        image = cv2.imread(path)
        if image is None:
            raise IOError(f'missing image: {path}')
        return {'image': cv2.cvtColor(image, cv2.COLOR_BGR2RGB),
                'meta': {'dataset_index': index, 'file_name': path}}


def batch_iterator(dataset: CocoKeypoints, batch_size: int, *,
                   seed: int = 0, shuffle: bool = True,
                   drop_last: bool = True, prefetch: int = 2,
                   epochs: Optional[int] = None) -> Iterator[Dict]:
    """Threaded prefetching batch iterator yielding stacked numpy batches."""
    stop = object()
    q: queue.Queue = queue.Queue(maxsize=prefetch)

    def producer():
        epoch = 0
        rng = np.random.RandomState(seed)
        while epochs is None or epoch < epochs:
            order = np.arange(len(dataset))
            if shuffle:
                rng.shuffle(order)
            for start in range(0, len(order), batch_size):
                idx = order[start:start + batch_size]
                if len(idx) < batch_size and drop_last:
                    continue
                samples = [dataset.get(int(i), rng) for i in idx]
                batch = {
                    'image': np.stack([s['image'] for s in samples]),
                    'anns': np.stack([s['anns'] for s in samples]),
                    'mask_miss': np.stack([s['mask_miss'] for s in samples]),
                    'metas': [s['meta'] for s in samples],
                    'epoch': epoch,
                }
                q.put(batch)
            epoch += 1
        q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
