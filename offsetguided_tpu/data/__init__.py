from .coco import CocoJson, ann_to_mask, build_miss_masks, rle_to_mask
from .pipeline import CocoKeypoints, batch_iterator
from . import transforms

__all__ = ['CocoJson', 'ann_to_mask', 'build_miss_masks', 'rle_to_mask',
           'CocoKeypoints', 'batch_iterator', 'transforms']
