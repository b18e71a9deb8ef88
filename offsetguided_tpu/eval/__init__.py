from .cocoeval import KeypointEval, compute_oks, evaluate_coco_keypoints
from .harness import (make_infer_fn, poses_to_coco_results, preprocess_eval,
                      run_images, validation)

__all__ = ['KeypointEval', 'compute_oks', 'evaluate_coco_keypoints',
           'make_infer_fn', 'poses_to_coco_results', 'preprocess_eval',
           'run_images', 'validation']
