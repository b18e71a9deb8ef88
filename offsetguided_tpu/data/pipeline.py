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
    transfer: image (S, S, 3) uint8, anns (P, J, 4) float32, mask_miss
    (S, S) uint8 in [0, 255], plus meta. uint8 stays uint8 across worker
    queues and the PCIe/ICI wire; normalization and /255 run inside the
    consumer's jitted program (ops/image.py, ops/encoder.py::downscale_mask).
    """

    def __init__(self, image_dir: str, ann_file: str, *,
                 skeleton: SkeletonConfig = SkeletonConfig(),
                 aug: Optional[AugmentationConfig] = AugmentationConfig(),
                 square_length: int = 512, max_persons: int = 32,
                 n_images: Optional[int] = None, all_persons: bool = False,
                 device_aug: bool = False, raw_canvas: int = 640):
        self.coco = CocoJson(ann_file)
        self.image_dir = image_dir
        self.skeleton = skeleton
        self.aug = aug
        self.square = square_length
        self.max_persons = max_persons
        # device_aug: the host keeps JPEG decode + RLE mask render +
        # RANDOMNESS (params/matrices sampled here, so batch contents stay
        # worker-count invariant) and ships the RAW image on a fixed
        # (raw_canvas, raw_canvas) canvas; the warp + photometric pixel work
        # runs inside the training step's jitted program (ops/augment.py)
        self.device_aug = device_aug
        self.raw_canvas = raw_canvas
        if device_aug and aug is None:
            raise ValueError('device_aug requires an AugmentationConfig')
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

    def sample_spec(self) -> Dict:
        """Per-sample array layout: key -> (shape, dtype). Drives generic
        batch stacking and the shared-memory transport (_ShmSlots)."""
        J = self.skeleton.n_keypoints
        S = self.raw_canvas if self.device_aug else self.square
        spec = {
            'image': ((S, S, 3), np.uint8),
            'mask_miss': ((S, S), np.uint8),
            'anns': ((self.max_persons, J, 4), np.float32),
        }
        if self.device_aug:
            spec.update({
                'aug_mat': ((3, 3), np.float32),       # src->dst forward
                'aug_mat_inv': ((2, 3), np.float32),   # dst->src (sampling)
                'aug_scale_xy': ((2,), np.float32),
                'aug_flags': ((2,), np.float32),       # [flip, gray]
                'aug_tint': ((4,), np.float32),        # [on, dh, ds, dv]
                'valid_hw': ((2,), np.int32),
            })
        return spec

    def _get_device_aug(self, image, anns, meta, mask_miss,
                        rng: np.random.RandomState) -> Dict:
        """Raw sample + host-sampled aug parameters (pixel work on device)."""
        aug = self.aug
        if rng.rand() < aug.annotation_jitter_prob:
            anns = T.annotation_jitter(anns, rng)
        params = T.sample_affine_params(aug, rng)
        gray = rng.rand() < aug.gray_prob
        if rng.rand() < aug.color_tint_prob:     # same draws as T.color_tint
            tint = np.array([1.0, rng.randint(-10, 11), rng.randint(-40, 41),
                             rng.randint(-30, 31)], np.float32)
        else:
            tint = np.zeros(4, np.float32)

        C0 = self.raw_canvas
        h, w = image.shape[:2]
        if max(h, w) > C0:                       # rare: source exceeds canvas
            # double-resample path: augmentation no longer matches the host
            # mode bit-for-bit (host warps once from full resolution) — warn
            # once so a wrong --raw-canvas on a non-COCO dataset is visible
            if not getattr(self, '_warned_canvas', False):
                self._warned_canvas = True
                import logging
                logging.getLogger(__name__).warning(
                    'device_aug: source image %dx%d exceeds raw_canvas=%d; '
                    'pre-downscaling on host (aug diverges from host mode '
                    'for such images — raise --raw-canvas to cover the '
                    'largest source side)', w, h, C0)
            image, anns, meta = T.rescale_long_absolute(image, anns, meta, C0)
            mask_miss = cv2.resize(mask_miss, (image.shape[1],
                                               image.shape[0]),
                                   interpolation=cv2.INTER_NEAREST)
            h, w = image.shape[:2]

        roi_center = T._roi_center(anns, meta)
        mat, sx, sy = T.build_affine_mat(params, roi_center,
                                         meta['width_height'],
                                         [self.square, self.square])
        raw = np.zeros((C0, C0, 3), np.uint8)
        raw[:h, :w] = image
        raw_mask = np.full((C0, C0), 255, np.uint8)
        raw_mask[:h, :w] = mask_miss

        # mirror warp_affine's meta updates (data/transforms.py:265-269) so
        # device-aug metas describe the WARPED geometry like host-mode metas
        # (inverse transforms / visualization consume these)
        meta = dict(meta)
        if params['flip']:
            jci = meta['joint_channel_ind'].copy()
            jci[self.left_index] = self.right_index
            jci[self.right_index] = self.left_index
            meta['joint_channel_ind'] = jci
        meta['hflip'] = bool(params['flip'])
        meta['scale'] = meta['scale'] * np.array([sx, sy])
        meta['rotate'] = meta['rotate'] + params['rotate']
        meta['affine_mat'] = mat @ meta['affine_mat']
        meta['width_height'] = np.array([self.square, self.square])

        return {
            'image': raw,
            'mask_miss': raw_mask,
            'anns': self._pad_persons(anns),
            'aug_mat': mat.astype(np.float32),
            'aug_mat_inv': np.linalg.inv(mat)[:2].astype(np.float32),
            'aug_scale_xy': np.array([sx, sy], np.float32),
            'aug_flags': np.array([params['flip'], gray], np.float32),
            'aug_tint': tint,
            'valid_hw': np.array([h, w], np.int32),
            'meta': meta,
        }

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

        if self.device_aug:
            return self._get_device_aug(image, anns, meta, mask_miss, rng)

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
            # uint8 across process/device boundaries; normalization runs on
            # device (ops/image.py::normalize_images) -- 4x less transport
            'image': np.ascontiguousarray(image, dtype=np.uint8),
            'anns': self._pad_persons(anns),
            'mask_miss': (mask_miss.astype(np.uint8)
                          if mask_miss is not None
                          else np.full(image.shape[:2], 255, np.uint8)),
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
    keys = dataset.sample_spec().keys()
    batch = {k: np.stack([s[k] for s in samples]) for k in keys}
    batch.update(metas=[s['meta'] for s in samples], epoch=epoch)
    return batch


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


class _ShmSlots:
    """Pool of fixed-size shared-memory slots for zero-pickle batch transport.

    Queue-pickled batches cost serialize + pipe-chunk + deserialize per batch
    (~13 MB at 512^2/batch-16 even with uint8 images); a shared-memory slot is
    written once by the worker and memcpy'd once by the parent. The layout
    comes from the dataset's `sample_spec()` (image | mask | anns, plus the
    per-sample aug-parameter arrays in device_aug mode).
    """

    def __init__(self, batch_size, sample_spec: Dict, n_slots):
        self.keys = list(sample_spec.keys())
        self.shapes = {k: (batch_size,) + tuple(shape)
                       for k, (shape, _) in sample_spec.items()}
        self.dtypes = {k: dt for k, (_, dt) in sample_spec.items()}
        self.offsets, off = {}, 0
        for k in self.keys:
            self.offsets[k] = off
            off += int(np.prod(self.shapes[k])) * np.dtype(self.dtypes[k]).itemsize
        self.nbytes = off
        self.n_slots = n_slots
        self._segs = None  # created lazily (parent) / attached (workers)

    def __getstate__(self):
        # spawn pickles this object to the workers: ship the layout only,
        # never the parent's live SharedMemory handles
        return {k: v for k, v in self.__dict__.items() if k != '_segs'}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._segs = None

    def create(self):
        from multiprocessing import shared_memory
        self._segs = [shared_memory.SharedMemory(create=True, size=self.nbytes)
                      for _ in range(self.n_slots)]
        return [s.name for s in self._segs]

    def attach(self, names):
        from multiprocessing import shared_memory
        from multiprocessing import resource_tracker
        # py<3.13 registers attachments with the resource tracker too
        # (bpo-39959), and spawn children share the PARENT's tracker process:
        # registering here is a no-op on the shared set, but unregistering
        # after the fact removes the PARENT's registration, so the parent's
        # own unlink() later hits a KeyError inside the tracker. Suppress the
        # registration instead of undoing it. (3.13+ has track=False.)
        orig = resource_tracker.register
        resource_tracker.register = (
            lambda name, rtype: None if rtype == 'shared_memory'
            else orig(name, rtype))
        try:
            self._segs = [shared_memory.SharedMemory(name=n) for n in names]
        finally:
            resource_tracker.register = orig

    def views(self, slot):
        buf = self._segs[slot].buf
        return {k: np.ndarray(self.shapes[k], self.dtypes[k], buffer=buf,
                              offset=self.offsets[k])
                for k in self.keys}

    def close(self, unlink):
        for seg in self._segs or []:
            try:
                seg.close()
                if unlink:
                    seg.unlink()
            except Exception:
                pass


def _worker_loop(dataset, seed, task_q, result_q, slots: _ShmSlots,
                 shm_names):
    """Aug worker process: no jax, no device access (cv2 + numpy only).
    Writes arrays into the assigned shared-memory slot; only (indices, metas)
    travel over the queue."""
    slots.attach(shm_names)
    try:
        while True:
            task = task_q.get()
            if task is None:
                return
            gb, epoch, idx, slot = task
            try:
                batch = _make_batch(dataset, idx,
                                    _batch_rng(seed, epoch, gb), epoch)
                v = slots.views(slot)
                n = batch['image'].shape[0]
                for k in slots.keys:
                    v[k][:n] = batch[k]
                result_q.put((gb, slot, n, batch['metas'], epoch, None))
            except Exception as e:      # surface in the parent, don't hang
                result_q.put((gb, -1, 0, None, epoch,
                              f'{type(e).__name__}: {e}'))
    finally:
        slots.close(unlink=False)


def _mp_batch_iterator(dataset, batch_size, seed, shuffle, drop_last,
                       prefetch, epochs, num_workers) -> Iterator[Dict]:
    """N-process augmentation pool (reference data/factory.py:109-156
    num_workers equivalent). Batches move through shared-memory slots (no
    per-batch pickling) and are re-ordered in the parent, so contents and
    order match the serial path exactly."""
    import multiprocessing as mp
    ctx = mp.get_context('spawn')       # never fork a jax-initialized parent
    max_in_flight = num_workers + max(prefetch, 1)
    slots = _ShmSlots(batch_size, dataset.sample_spec(),
                      n_slots=max_in_flight)
    shm_names = slots.create()
    task_q = ctx.Queue()
    result_q = ctx.Queue()
    workers = [ctx.Process(target=_worker_loop,
                           args=(dataset, seed, task_q, result_q, slots,
                                 shm_names),
                           daemon=True)
               for _ in range(num_workers)]
    for w in workers:
        w.start()
    plan = _batch_plan(dataset, batch_size, seed, shuffle, drop_last, epochs)
    pending: Dict[int, Dict] = {}
    free_slots = list(range(max_in_flight))
    try:
        in_flight, next_emit, exhausted = 0, 0, False
        while True:
            while free_slots and not exhausted:
                task = next(plan, None)
                if task is None:
                    exhausted = True
                    break
                gb, epoch, idx = task
                task_q.put((gb, epoch, idx, free_slots.pop()))
                in_flight += 1
            if in_flight == 0:
                return
            while True:
                # bounded get + liveness check: a worker SIGKILLed mid-batch
                # (OOM killer, cv2 segfault) never enqueues its result; a
                # bare blocking get() would freeze training silently
                try:
                    gb, slot, n, metas, epoch, err = result_q.get(timeout=5.0)
                    break
                except queue.Empty:
                    dead = [w for w in workers if not w.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f'{len(dead)} data worker(s) died without a '
                            f'result (exitcodes '
                            f'{[w.exitcode for w in dead]}); likely OOM kill '
                            'or a native crash in cv2 -- reduce '
                            '--loader-workers or batch size')
            in_flight -= 1
            if err is not None:
                raise RuntimeError(f'data worker failed on batch {gb}: {err}')
            v = slots.views(slot)
            pending[gb] = {k: v[k][:n].copy() for k in slots.keys}
            pending[gb].update(metas=metas, epoch=epoch)
            free_slots.append(slot)
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
        slots.close(unlink=True)


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
