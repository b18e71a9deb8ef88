"""COCO evaluation harness: preprocess -> jitted forward+decode -> inverse ->
OKS AP.

Reference counterpart: evaluate.py:125-328. Differences by design:
- fixed shapes: long-edge mode produces exactly (long_edge, long_edge) inputs
  (rescale + center pad), so one jit compilation serves the whole epoch;
  fixed-height mode pads width up to a multiple of `EvalConfig.width_bucket`
  (default 256, a multiple of max_stride), so the whole epoch compiles at
  most ceil(max_width / width_bucket) distinct programs instead of one per
  distinct 128-multiple width (reference context: evaluate.py:141-154), and
  bucketing also enables BATCHED fixed-height eval (the reference is stuck
  at batch 1 there): images are ordered by aspect ratio and batched within
  each padded shape, flushing a partial batch at bucket boundaries.
- flip-test doubles the batch inside the jitted function (no host concat);
- decode runs fully on device; only final (max_poses, J, 6) pose tensors come
  back to host for the inverse transform and COCO json records.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Dict, List, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import EvalConfig, SkeletonConfig
from ..data import transforms as T
from ..data.coco import CocoJson
from ..decoder import PostProcessor
from ..ops.image import normalize_images as normalize_on_device
# uint8 -> ImageNet-normalized float32 inside jit; shared with the train step


def preprocess_eval(image: np.ndarray, anns: np.ndarray, cfg: EvalConfig,
                    n_keypoints: int = 17, normalize: bool = True):
    """Rescale+pad for evaluation; returns (image, anns, meta).

    normalize=True returns the float32 ImageNet-normalized image;
    normalize=False keeps uint8 (the harness transfers uint8 and normalizes
    ON DEVICE -- 4x less host->device bandwidth, same math)."""
    h, w = image.shape[:2]
    meta = T.make_meta(w, h, n_keypoints)
    if cfg.fixed_height:
        image, anns, meta = T.rescale_high_absolute(image, anns, meta,
                                                    cfg.long_edge)
        # pad only the WIDTH to the bucket multiple (bounds the number of
        # distinct compiled programs over a variable-aspect-ratio epoch);
        # height keeps the plain max_stride padding
        bucket = max(cfg.width_bucket, cfg.max_stride)
        if bucket % cfg.max_stride != 0:
            raise ValueError(
                f'--width-bucket ({cfg.width_bucket}) must be a multiple of '
                f'--max-stride ({cfg.max_stride}); effective bucket {bucket} '
                f'is not')
        image, anns, meta = T.rightdown_pad(image, anns, meta,
                                            cfg.max_stride,
                                            w_multiple=bucket)
    else:
        image, anns, meta = T.rescale_long_absolute(image, anns, meta,
                                                    cfg.long_edge)
        image, anns, meta = T.center_pad(image, anns, meta, cfg.long_edge)
    return (T.normalize_image(image) if normalize else image), anns, meta




def make_infer_fn(model, variables, pp: PostProcessor, flip_test: bool,
                  mesh=None):
    """One jitted program: forward (+flipped half) -> decode -> poses.

    With a `mesh`, the whole pipeline runs under `shard_map` over the `data`
    axis: each chip processes its batch shard independently (eval BatchNorm
    uses running stats, and the Pallas grouping kernel -- a custom call XLA
    cannot auto-partition -- executes per shard)."""

    def body(vars_, images):
        # variables enter as an ARGUMENT: closing over them would bake 187M
        # parameters into the program as constants, exploding compile time
        # (observed: >30 min remote compiles that the tunnel kills)
        if images.dtype == jnp.uint8:
            # uint8 arrives over the wire; normalization runs on device
            images = normalize_on_device(images)
        if flip_test:
            images = jnp.concatenate([images, jnp.flip(images, axis=2)],
                                     axis=0)
        preds = model.apply(vars_, images, train=False)
        return pp._decode_body(preds, flip_test=flip_test)

    if mesh is None:
        jitted = jax.jit(body)
        return lambda images: jitted(variables, images)

    from jax.sharding import PartitionSpec as P
    sharded = jax.shard_map(body, mesh=mesh, in_specs=(P(), P('data')),
                            out_specs=(P('data'), P('data'), P('data')),
                            check_vma=False)
    jitted = jax.jit(sharded)
    return lambda images: jitted(variables, images)


def poses_to_coco_results(poses: np.ndarray, image_id: int) -> List[Dict]:
    """(M, J, 6) decoded poses -> COCO keypoint result dicts
    (reference evaluate.py:236-265, including the dummy record when empty)."""
    results = []
    poses = poses.copy()
    poses[:, :, :2] = np.around(poses[:, :, :2], 2)
    for person in poses:
        if not np.any(person[:, :3]):
            continue
        v = person[:, 2]
        kps = []
        for x, y, vv in person[:, :3]:
            kps += [float(x), float(y), 1 if (x > 0 or y > 0) else 0]
        results.append({
            'image_id': image_id,
            'category_id': 1,
            'keypoints': kps,
            'score': float(v.sum() / len(v)),
        })
    if not results:
        results.append({'image_id': image_id, 'category_id': 1,
                        'keypoints': np.zeros(poses.shape[1] * 3).tolist(),
                        'score': 0.01})
    return results


def _load_eval_image(coco: CocoJson, image_dir: str, img_id: int,
                     cfg: EvalConfig, n_keypoints: int):
    """IO + preprocess for one image; (img_id, float_image|None, meta|None).
    Runs on a worker thread (cv2 releases the GIL in imread/warpAffine)."""
    info = coco.image_info(img_id)
    path = os.path.join(image_dir, info['file_name'])
    img = cv2.imread(path)
    if img is None:
        logging.getLogger(__name__).warning(
            'unreadable image %s (id %s): emitting dummy record',
            path, img_id)
        return img_id, None, None
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    # keep uint8: the device normalizes (4x less host->device transfer)
    fimg, _, meta = preprocess_eval(
        img, np.zeros((0, n_keypoints, 4), np.float32), cfg, n_keypoints,
        normalize=False)
    return img_id, fimg, meta


def eval_image_ids(coco: CocoJson, n_images: Optional[int] = None,
                   all_images: bool = False) -> List[int]:
    """The image set run_images evaluates: person images (or all images,
    test-dev protocol), sorted, optionally truncated. The metric must be
    restricted to the same set (reference evaluate.py:317-324)."""
    ids = coco.image_ids(with_persons=not all_images)
    if n_images:
        ids = ids[:n_images]
    return ids


def run_images(model, variables, pp: PostProcessor, coco: CocoJson,
               image_dir: str, cfg: EvalConfig,
               n_images: Optional[int] = None,
               skeleton: Optional[SkeletonConfig] = None,
               progress: bool = False, all_images: bool = False):
    """Evaluate the model over a COCO image set; returns result dicts.

    Host parallelism (reference gets this from DataLoader workers,
    evaluate.py:171-182): `cfg.io_workers` threads run imread+resize+pad
    ahead of the device loop through a bounded ordered window, and the
    device result of batch N is fetched only AFTER batch N+1's inference
    has been dispatched, overlapping host postprocess with device compute
    (jax dispatch is async).

    all_images: include images without person annotations (test-dev protocol,
    reference evaluate.py:117-118)."""
    from concurrent.futures import ThreadPoolExecutor

    skeleton = skeleton or SkeletonConfig()
    ids = eval_image_ids(coco, n_images=n_images, all_images=all_images)
    batch_size = cfg.batch_size
    if cfg.fixed_height and batch_size > 1:
        # The reference runs fixed-height at batch 1 out of necessity (every
        # image has its own width, evaluate.py:141-154); width BUCKETING
        # makes same-shape batches possible. Order images by aspect ratio so
        # same-padded-width images are consecutive — the dispatch loop
        # flushes a partial batch whenever the padded shape changes, so at
        # most n_buckets partial batches per epoch. Per-image decode is
        # batch-independent (eval BN uses running stats), so records are
        # identical to batch-1 (tested); COCO metrics don't depend on
        # evaluation order.
        ids = sorted(ids, key=lambda i: (
            lambda inf: inf['width'] / max(inf['height'], 1))(
                coco.image_info(i)))
    infer = make_infer_fn(model, variables, pp, cfg.flip_test)

    results: List[Dict] = []
    pending = None          # (device_out, metas, ids, n) awaiting host fetch

    def drain():
        nonlocal pending
        if pending is None:
            return
        (poses, _, counts), metas, bids, n = pending
        pending = None
        poses = np.asarray(poses)
        counts = np.asarray(counts)
        for i in range(n):
            # drop zero-padded pose rows BEFORE the inverse transform (it
            # would shift them into spurious nonzero detections)
            valid = poses[i][:int(counts[i])]
            inv = T.annotations_inverse(valid, metas[i])
            results.extend(poses_to_coco_results(inv, bids[i]))

    def dispatch(batch_imgs, batch_metas, batch_ids):
        n = len(batch_imgs)
        while len(batch_imgs) < batch_size:   # pad partial batch
            batch_imgs.append(np.zeros_like(batch_imgs[0]))
        out = infer(jnp.asarray(np.stack(batch_imgs)))
        return out, list(batch_metas), list(batch_ids), n

    n_workers = max(1, cfg.io_workers)
    window = max(batch_size * 2, n_workers * 2)
    batch_imgs, batch_metas, batch_ids = [], [], []
    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        futures = []
        submitted = 0

        def submit_more():
            nonlocal submitted
            while submitted < len(ids) and len(futures) < window:
                futures.append(ex.submit(
                    _load_eval_image, coco, image_dir, ids[submitted], cfg,
                    skeleton.n_keypoints))
                submitted += 1

        submit_more()
        done = 0
        while futures:
            img_id, fimg, meta = futures.pop(0).result()
            submit_more()
            done += 1
            if fimg is None:
                # test-dev protocol: every image must produce a record
                results.append({'image_id': img_id, 'category_id': 1,
                                'keypoints': np.zeros(
                                    skeleton.n_keypoints * 3).tolist(),
                                'score': 0.01})
            else:
                if batch_imgs and fimg.shape != batch_imgs[0].shape:
                    # fixed-height: padded width changed — flush the partial
                    # same-shape batch (at most one flush per width bucket
                    # per epoch thanks to the aspect-ratio ordering)
                    nxt = dispatch(batch_imgs, batch_metas, batch_ids)
                    drain()
                    pending = nxt
                    batch_imgs, batch_metas, batch_ids = [], [], []
                batch_imgs.append(fimg)
                batch_metas.append(meta)
                batch_ids.append(img_id)
                if len(batch_imgs) == batch_size:
                    nxt = dispatch(batch_imgs, batch_metas, batch_ids)
                    drain()          # host work overlaps the running infer
                    pending = nxt
                    batch_imgs, batch_metas, batch_ids = [], [], []
            if progress and done % 100 == 0:
                print(f'eval {done}/{len(ids)}')
    if batch_imgs:
        nxt = dispatch(batch_imgs, batch_metas, batch_ids)
        drain()
        pending = nxt
    drain()
    return results


def validation(model, variables, pp, ann_file: str, image_dir: str,
               cfg: EvalConfig, n_images=None, skeleton=None) -> Dict[str, float]:
    """Full COCO validation -> metrics (reference evaluate.py:303-328)."""
    from .cocoeval import evaluate_coco_keypoints
    skeleton = skeleton or SkeletonConfig()
    coco = CocoJson(ann_file)
    results = run_images(model, variables, pp, coco, image_dir, cfg,
                         n_images=n_images, skeleton=skeleton)
    # restrict the metric to the evaluated subset (reference evaluate.py:324)
    ids = eval_image_ids(coco, n_images=n_images)
    return evaluate_coco_keypoints(coco, results, skeleton.sigmas,
                                   image_ids=ids)
