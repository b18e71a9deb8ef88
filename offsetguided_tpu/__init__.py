"""offsetguided_tpu: a TPU-native (JAX/XLA/Pallas) bottom-up multi-person 2D pose
estimation framework.

Re-designed from scratch for TPU with the capabilities of the reference framework
hellojialee/OffsetGuided (PyTorch/CUDA): stacked-hourglass backbones regress keypoint
Gaussian heatmaps and per-limb guiding-offset maps; decoding (peak NMS, per-channel
top-k, offset-guided limb pairing and greedy skeleton grouping) runs entirely on device
as fixed-shape jitted XLA/Pallas computation; training uses data parallelism over a
`jax.sharding.Mesh` with bf16 compute.

Layer map (mirrors reference SURVEY.md section 1):
    config/    keypoint taxonomy, skeletons, OKS sigmas, flip tables, dataclass configs
    models/    flax.linen Hourglass-104 / 4-stage backbones, heads, checkpointing
    ops/       encoder (GT rendering), decoder (NMS/top-k/limb pairing), grouping,
               losses, resize kernels -- all batched, fixed-shape, jittable
    parallel/  mesh construction, sharded train/eval steps
    data/      COCO loading (pycocotools-free), host-side geometric transforms
    eval/      OKS-based COCO keypoint AP evaluator + evaluation harness
    utils/     meters, LR schedules, structured logging
"""

__version__ = "0.1.0"
