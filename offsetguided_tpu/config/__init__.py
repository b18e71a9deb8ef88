from .coco import (
    COCO_KEYPOINTS,
    COCO_PERSON_SIGMAS,
    COCO_PERSON_SKELETON,
    COCO_PERSON_WITH_REDUNDANT_SKELETON,
    DENSER_COCO_PERSON_SKELETON,
    REDUNDANT_CONNECTIONS,
    KINEMATIC_TREE_SKELETON,
    SKELETONS_BY_SIZE,
    HFLIP,
    LEFT_INDEX,
    RIGHT_INDEX,
    DATA_MEAN,
    DATA_STD,
    heatmap_hflip,
    offset_hflip,
    skeleton_from_arrays,
)
from .defaults import (
    SkeletonConfig,
    EncoderConfig,
    DecoderConfig,
    HeadsConfig,
    ModelConfig,
    LossConfig,
    TrainConfig,
    AugmentationConfig,
    EvalConfig,
)

__all__ = [
    'COCO_KEYPOINTS', 'COCO_PERSON_SIGMAS', 'COCO_PERSON_SKELETON',
    'COCO_PERSON_WITH_REDUNDANT_SKELETON', 'DENSER_COCO_PERSON_SKELETON',
    'REDUNDANT_CONNECTIONS', 'KINEMATIC_TREE_SKELETON', 'SKELETONS_BY_SIZE',
    'HFLIP', 'LEFT_INDEX', 'RIGHT_INDEX', 'DATA_MEAN', 'DATA_STD',
    'heatmap_hflip', 'offset_hflip', 'skeleton_from_arrays',
    'SkeletonConfig', 'EncoderConfig', 'DecoderConfig', 'HeadsConfig',
    'ModelConfig', 'LossConfig', 'TrainConfig', 'AugmentationConfig', 'EvalConfig',
]
