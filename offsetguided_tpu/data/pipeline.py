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


def _batch_rng(seed: int, epoch: int, batch_index: int) -> np.random.RandomState:
    """Augmentation RNG derived from (seed, epoch, batch) alone, so batch
    contents are identical for any worker count (serial, threaded, N
    processes) -- stronger than torch DataLoader's per-worker streams."""
    return np.random.RandomState(
        (seed * 1000003 + epoch * 8191 + batch_index) % (2 ** 31 - 1))


def _make_batch(dataset: CocoKeypoints, idx, rng, epoch: int) -> Dict:
    samples = [dataset.get(int(i), rng) for i in idx]
    return {
        'image': np.stack([s['image'] for s in samples]),
        'anns': np.stack([s['anns'] for s in samples]),
        'mask_miss': np.stack([s['mask_miss'] for s in samples]),
        'metas': [s['meta'] for s in samples],
        'epoch': epoch,
    }


def _batch_plan(dataset, batch_size, seed, shuffle, drop_last, epochs):
    """Yields (global_batch_index, epoch, index_array). The shuffle stream
    depends only on `seed`, never on worker count."""
    order_rng = np.random.RandomState(seed)
    epoch, gb = 0, 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            order_rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size and drop_last:
                continue
            yield gb, epoch, idx
            gb += 1
        epoch += 1


def _worker_loop(dataset, seed, task_q, result_q):
    """Aug worker process: no jax, no device access (cv2 + numpy only)."""
    while True:
        task = task_q.get()
        if task is None:
            return
        gb, epoch, idx = task
        try:
            batch = _make_batch(dataset, idx, _batch_rng(seed, epoch, gb),
                                epoch)
            result_q.put((gb, batch, None))
        except Exception as e:          # surface in the parent, don't hang
            result_q.put((gb, None, f'{type(e).__name__}: {e}'))


def _mp_batch_iterator(dataset, batch_size, seed, shuffle, drop_last,
                       prefetch, epochs, num_workers) -> Iterator[Dict]:
    """N-process augmentation pool (reference data/factory.py:109-156
    num_workers equivalent). Batches are handed out round-robin and re-ordered
    in the parent, so iteration order matches the serial path exactly."""
    import multiprocessing as mp
    ctx = mp.get_context('spawn')       # never fork a jax-initialized parent
    task_q = ctx.Queue()
    result_q = ctx.Queue(maxsize=max(prefetch, num_workers) + 1)
    workers = [ctx.Process(target=_worker_loop,
                           args=(dataset, seed, task_q, result_q),
                           daemon=True)
               for _ in range(num_workers)]
    for w in workers:
        w.start()
    plan = _batch_plan(dataset, batch_size, seed, shuffle, drop_last, epochs)
    max_in_flight = num_workers + max(prefetch, 1)
    pending: Dict[int, Dict] = {}
    try:
        in_flight, next_emit, exhausted = 0, 0, False
        while True:
            while in_flight < max_in_flight and not exhausted:
                task = next(plan, None)
                if task is None:
                    exhausted = True
                    break
                task_q.put(task)
                in_flight += 1
            if in_flight == 0:
                return
            gb, batch, err = result_q.get()
            in_flight -= 1
            if err is not None:
                raise RuntimeError(f'data worker failed on batch {gb}: {err}')
            pending[gb] = batch
            while next_emit in pending:
                yield pending.pop(next_emit)
                next_emit += 1
    finally:
        for _ in workers:
            task_q.put(None)
        for w in workers:
            w.join(timeout=2.0)
            if w.is_alive():
                w.terminate()


def batch_iterator(dataset: CocoKeypoints, batch_size: int, *,
                   seed: int = 0, shuffle: bool = True,
                   drop_last: bool = True, prefetch: int = 2,
                   epochs: Optional[int] = None,
                   num_workers: int = 0) -> Iterator[Dict]:
    """Prefetching batch iterator yielding stacked numpy batches.

    num_workers=0: one background producer thread (IO/aug overlap only).
    num_workers>0: that many augmentation processes (the reference's
    DataLoader num_workers, data/factory.py:109-156). Batch contents and
    order are identical for every worker count (per-batch derived RNG).
    """
    if num_workers > 0:
        yield from _mp_batch_iterator(dataset, batch_size, seed, shuffle,
                                      drop_last, prefetch, epochs,
                                      num_workers)
        return
    stop = object()
    q: queue.Queue = queue.Queue(maxsize=prefetch)

    def producer():
        try:
            for gb, epoch, idx in _batch_plan(dataset, batch_size, seed,
                                              shuffle, drop_last, epochs):
                q.put(_make_batch(dataset, idx,
                                  _batch_rng(seed, epoch, gb), epoch))
        except Exception as e:
            q.put(e)
            return
        q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, Exception):
            raise item
        yield item
