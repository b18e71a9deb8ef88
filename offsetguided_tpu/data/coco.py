"""COCO keypoint dataset access without pycocotools.

The reference depends on pycocotools for annotation loading, RLE mask decoding
and crowd-mask rendering (data/dataset.py:43-45, 136-197). pycocotools is not
available in this environment, so this module provides the needed subset
natively: JSON index, compressed/uncompressed RLE decoding, and polygon
rasterization (cv2.fillPoly).
"""
from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Optional

import cv2
import numpy as np


def rle_decode_counts(s: str) -> List[int]:
    """Decode a COCO compressed RLE counts string (LEB128-style, 5-bit words
    with continuation and sign bits) into run lengths."""
    counts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_to_mask(rle: Dict) -> np.ndarray:
    """COCO RLE dict {'size': [h, w], 'counts': str|list} -> uint8 mask.

    Uses the native C++ codec (offsetguided_tpu/native/rle.cpp) when available; falls back to
    the pure-Python path."""
    h, w = rle['size']
    counts = rle['counts']
    if isinstance(counts, str):
        from . import native
        m = native.rle_string_to_mask(counts, h, w)
        if m is not None:
            return m
        counts = rle_decode_counts(counts)
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for run in counts:
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val ^= 1
    # COCO RLE is column-major
    return flat.reshape(w, h).T


def polygons_to_mask(polys: List[List[float]], h: int, w: int) -> np.ndarray:
    """Rasterize polygon segmentation to a uint8 mask (union of parts)."""
    mask = np.zeros((h, w), dtype=np.uint8)
    pts = [np.round(np.asarray(p, dtype=np.float64).reshape(-1, 2))
           .astype(np.int32) for p in polys if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def ann_to_mask(ann: Dict, h: int, w: int) -> np.ndarray:
    """Segmentation of one annotation -> uint8 {0,1} mask
    (pycocotools annToMask equivalent)."""
    seg = ann.get('segmentation')
    if seg is None:
        return np.zeros((h, w), dtype=np.uint8)
    if isinstance(seg, dict):
        return rle_to_mask(seg)
    return polygons_to_mask(seg, h, w)


class CocoJson:
    """Minimal COCO annotation index (person keypoints).

    API mirrors the pycocotools calls the reference makes
    (data/dataset.py:46-107): image listing/filtering, per-image annotation
    lookup, image info.
    """

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            d = json.load(f)
        self.dataset = d
        self.imgs = {im['id']: im for im in d.get('images', [])}
        self.cats = {c['id']: c for c in d.get('categories', [])}
        self.person_cat_ids = [c['id'] for c in d.get('categories', [])
                               if c.get('name') == 'person'] or [1]
        self.img_to_anns = defaultdict(list)
        for ann in d.get('annotations', []):
            if ann.get('category_id') in self.person_cat_ids:
                self.img_to_anns[ann['image_id']].append(ann)

    def image_ids(self, with_persons: bool = False,
                  with_keypoints: bool = False) -> List[int]:
        ids = list(self.imgs.keys())
        if with_persons or with_keypoints:
            ids = [i for i in ids if self.img_to_anns.get(i)]
        if with_keypoints:
            def has_kp(i):
                return any(any(v > 0 for v in a.get('keypoints', [])[2::3])
                           for a in self.img_to_anns[i])
            ids = [i for i in ids if has_kp(i)]
        return sorted(ids)

    def anns_for_image(self, image_id: int) -> List[Dict]:
        return self.img_to_anns.get(image_id, [])

    def image_info(self, image_id: int) -> Dict:
        return self.imgs[image_id]


def build_miss_masks(anns: List[Dict], h: int, w: int):
    """(mask_miss, mask_all) uint8 masks, 0/255 semantics like the reference
    (data/dataset.py:136-197): mask_miss zeroes crowd regions and persons
    without keypoint annotations (or area <= 32^2); mask_all covers every
    person segment."""
    mask_all = np.zeros((h, w), dtype=np.uint8)
    mask_miss = np.zeros((h, w), dtype=np.uint8)
    mask_crowd: Optional[np.ndarray] = None
    for ann in anns:
        m = ann_to_mask(ann, h, w)
        if ann.get('iscrowd'):
            overlap = np.bitwise_and(mask_all, m)
            add = m - overlap
            mask_crowd = add if mask_crowd is None else \
                np.bitwise_or(mask_crowd, add)
            continue
        mask_all = np.bitwise_or(mask_all, m)
        if ann.get('num_keypoints', 0) <= 0 or ann.get('area', 0) <= 32 * 32:
            mask_miss = np.bitwise_or(mask_miss, m)
    if mask_crowd is None:
        mask_miss = np.logical_not(mask_miss)
    else:
        mask_miss = np.logical_not(np.bitwise_or(mask_miss, mask_crowd))
        mask_all = np.bitwise_or(mask_all, mask_crowd)
    return (mask_miss.astype(np.uint8) * 255, mask_all.astype(np.uint8) * 255)
