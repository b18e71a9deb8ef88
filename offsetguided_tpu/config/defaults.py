"""Dataclass configuration for every layer of the framework.

The reference configures layers through argparse flags mutated onto *class
attributes* (e.g. encoder/factory.py:43-52, models/heads.py:190-194) -- an
anti-pattern SURVEY.md section 5 calls out explicitly. Here every subsystem takes an
explicit frozen dataclass; CLI layers construct these and nothing else is global.

Defaults replicate the reference's published best configuration
(reference README.md:69-87 and docs/cli-help-*.txt).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

from . import coco


@dataclasses.dataclass(frozen=True)
class SkeletonConfig:
    """Keypoint taxonomy + limb topology bundle.

    Replaces the reference's head-name -> skeleton string matching
    (decoder/factory.py:191-231) with explicit data.
    """
    keypoints: tuple = coco.COCO_KEYPOINTS
    sigmas: tuple = coco.COCO_PERSON_SIGMAS
    skeleton: tuple = coco.COCO_PERSON_SKELETON
    # stored as a sorted tuple of pairs so the config stays hashable (it is a
    # static jit argument)
    hflip: tuple = tuple(sorted(coco.HFLIP.items()))

    @property
    def n_keypoints(self) -> int:
        return len(self.keypoints)

    @property
    def n_limbs(self) -> int:
        return len(self.skeleton)

    def heatmap_flip_indices(self):
        return coco.heatmap_hflip(self.keypoints, dict(self.hflip))

    def offset_flip_indices(self):
        return coco.offset_hflip(self.keypoints, self.skeleton,
                                 dict(self.hflip))

    @classmethod
    def coco(cls, n_limbs: int = 19) -> 'SkeletonConfig':
        return cls(skeleton=coco.SKELETONS_BY_SIZE[n_limbs])

    @classmethod
    def crowdpose(cls) -> 'SkeletonConfig':
        from . import crowdpose as cp
        return cls(keypoints=cp.CROWDPOSE_KEYPOINTS,
                   sigmas=cp.CROWDPOSE_SIGMAS,
                   skeleton=cp.CROWDPOSE_PERSON_SKELETON,
                   hflip=tuple(sorted(cp.CROWDPOSE_HFLIP.items())))


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Ground-truth rendering configuration.

    Defaults mirror encoder/heatmap.py:19-25 and encoder/offset.py:20-24 in the
    reference.
    """
    stride: int = 4
    sigma: float = 7.0
    gaussian_clip: float = 0.01       # responses below this are zeroed
    fill_jitter_size: int = 3         # window diameter for jitter-offset fill
    fill_scale_size: int = 7          # window diameter for guiding-offset/scale fill
    min_jscale: float = 1.0           # keypoint scales below this become NaN labels
    include_background: bool = True
    include_jitter_offset: bool = True
    include_scale: bool = True
    max_persons: int = 32             # fixed-shape padding for annotations per image
    mask_miss_threshold: float = 0.7  # bool threshold after mask downscale


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Decoding / grouping configuration.

    Defaults mirror decoder/factory.py:149-189 in the reference plus the
    README.md:74 evaluation overrides where noted.
    """
    stride: int = 4                   # feature stride of hmp/omp heads
    topk: int = 48                    # candidate keypoints per channel
    thre_hmp: float = 0.06            # low-response keypoints pushed off-image
    min_len: float = 0.5              # clamp for limb length in scoring
    dist_max: float = 20.0            # max guiding-offset error (pixels)
    use_scale: bool = True            # use inferred keypoint scales in dist gate
    use_jitter_offset: bool = True    # refine coordinates with jitter offsets
    default_scale: float = 4.0        # keypoint scale when scmps are absent
    person_thre: float = 0.06         # final instance score threshold
    sort_dim: int = 2                 # 2 = sort poses by keypoint score, 4 = limb score
    resize_mode: str = 'bicubic'      # heatmap upsampling filter
    feat_stage: int = -1              # which stack's predictions to decode
    nms_kernel: int = 3               # peak NMS window
    max_poses: int = 40               # fixed-shape capacity of the grouped output
    # fixed-shape capacity of *intermediate* skeleton rows during grouping.
    # The reference grows its subset list unboundedly (decoder/group.py:166-177);
    # here limbs that would start a new skeleton once all rows are occupied are
    # dropped (lowest-scored candidates, since limbs are processed in score
    # order) -- see tests/test_grouping_overflow.py for measured behavior.
    capacity: int = 64
    upsampled_decode: bool = True     # decode at input resolution (reference parity)
    # heatmap-score-weighted local averaging of guiding offsets before limb
    # collection (reference opt-in: decoder/factory.py:70-72, offset.py:8-43)
    scored_offset: bool = False
    # 'auto': single fused Pallas grouping kernel on TPU, XLA elsewhere
    pallas_grouping: str = 'auto'     # 'auto' | 'on' | 'off'
    # flip-test offset merge in 4-D vector space: instead of averaging the
    # original and mirrored guiding offsets, keep BOTH and pair keypoints by
    # the 4-D distance |[g1;g2] - [t;t]| (reference --cat-flip-offset,
    # decoder/factory.py:115-127 + collect.py:143-175 vector_nd=4). The
    # reference documents this variant as costing 0.5 AP and defaults it
    # off; implemented for full CLI parity.
    cat_flip_offs: bool = False
    # refine the regressed guiding endpoints with the jitter offset sampled
    # at the (integer) endpoint position BEFORE the pairing distance-min
    # (reference collect.py:158-165, on by default there when the jomp head
    # exists). Off by default here: the reference's own comment says the
    # trick "does not help at all", and its implementation indexes the
    # jitter map with transposed coordinates (jomps[i, :, x, y]); this
    # implementation uses the intended [y, x] indexing.
    guid_jitter_refine: bool = False
    # maps processed per grid step by the fused peaks kernel; >1 batches the
    # top-k extraction loop across maps stacked along sublanes
    # (ops/pallas/peaks_pallas.py::_fused_peaks_batched). Results are
    # identical per map; this is purely a performance knob. Real-TPU A/B at
    # the headline 640^2/batch-8 config (BENCHMARKS.md, 2026-08-18):
    # 1 -> 195.3 img/s, 2 -> 202.3, 3 -> 204.7, 4 -> 203.8, 6 -> 205.5;
    # plateau from 3 up (the loop's vector ops fill (mb, hb) vregs), so the
    # default takes the measured best. VMEM scratch scales with mb
    # (2 * mb*hb*hb f32 = 4.9 MB at mb=6, 640^2).
    peaks_map_batch: int = 6
    # extra merge-only passes AFTER the last limb iteration. Our grouping
    # merges at most one mergee per target row per iteration (remaining
    # pairs settle on later iterations); without settling, pairs still
    # unresolved after the final limb would dangle as separate partial
    # poses. The reference instead merges all pairs at once from a
    # pre-merge snapshot, LOSING chained mergees' keypoints
    # (decoder/group.py:140-155); settling converges to the lossless
    # transitive closure. See tests/test_grouping_adversarial.py.
    settle_passes: int = 2


@dataclasses.dataclass(frozen=True)
class HeadsConfig:
    """Head-net channel configuration (reference models/heads.py:10-142)."""
    n_keypoints: int = 17
    n_limbs: int = 19
    include_background: bool = True
    include_jitter_offset: bool = True
    include_spread: bool = False
    include_scale: bool = True
    # 3x3-conv + ReLU + 1x1 tower heads instead of plain 1x1 convs
    # (reference models/heads_3x3.py:11-167 variant)
    tower: bool = False
    tower_dim: int = 256


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Backbone + heads configuration (reference models/factory.py:10-125)."""
    basenet: str = 'hourglass104'     # 'hourglass104' | 'hourglass4stage'
    n_stacks: int = 2
    cnv_dim: int = 256
    # Hourglass-104 recursion spec (reference models/hourglass_104.py:310-312)
    hg_order: int = 5
    dims: Sequence[int] = (256, 256, 384, 384, 384, 512)
    modules: Sequence[int] = (2, 2, 2, 2, 2, 4)
    heads: HeadsConfig = dataclasses.field(default_factory=HeadsConfig)
    # bf16 compute with fp32 params/statistics is the TPU-equivalent of apex AMP O1
    compute_dtype: str = 'bfloat16'
    param_dtype: str = 'float32'
    bn_momentum: float = 0.9
    # run the 7x7 s2 stem in the space-to-depth domain (exactly equivalent
    # math, 4x the MXU contraction depth on the 3-channel input; measured 8%
    # MFU dense vs near-roofline s2d on v5e). Params are unaffected.
    stem_s2d: bool = True
    # rematerialize each hourglass stack in the backward pass
    # (jax.checkpoint): activations inside a stack are recomputed instead of
    # stored, trading ~1 extra forward per stack for ~n_stacks x less
    # activation HBM — the lever for larger train batches per chip. Param
    # tree layout is unchanged (explicit module names), so checkpoints are
    # interchangeable between remat and non-remat runs.
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss selection and weighting (reference models/losses.py, factory.py:52-55).

    `lambdas` weight order: [hmp, background, jitter-offset, offset, scale],
    matching the reference `--lambdas` flag. Defaults are the README training
    recipe: focal-L2(gamma=2) + instance-normalized offset L1 + scale L1 with
    lambdas 1 0 0 10000 10 and --sqrt-re (reference README.md:155-161).
    """
    heatmap_loss: str = 'focal_l2'
    jitter_loss: str = 'offset_l1'
    offset_loss: str = 'offset_instance_l1'
    scale_loss: str = 'scale_l1'
    lambdas: Sequence[float] = (1.0, 0.0, 0.0, 10000.0, 10.0)
    stack_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    ftao: float = 0.01                # focal-L2 fore/background threshold (TAU)
    fgamma: float = 2.0               # focal-L2 scaling order (GAMMA)
    offset_margin: float = 1e-5       # per-element losses below MARGIN are ignored
    scale_margin: float = 0.1         # MARGIN2 for scale loss
    sqrt_re: bool = True              # sqrt-rescale offset losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization recipe (reference train_dist.py:36-105, utils/util.py:27-60)."""
    optimizer: str = 'adam'           # 'adam' | 'sgd'
    learning_rate: float = 1.25e-4    # scaled by data-parallel world size
    momentum: float = 0.9
    weight_decay: float = 0.0
    # Adam moment-state dtype: 'float32' (default) or 'bfloat16'. bf16
    # moments halve the optimizer's HBM footprint AND its per-step update
    # traffic (measured at its bandwidth floor, BENCHMARKS.md); moments are
    # round-tripped through fp32 inside the update so only storage loses
    # precision. Convergence parity gated by selfcheck AP before use.
    opt_state_dtype: str = 'float32'
    warmup_epochs: int = 0
    lr_drop_epochs: Sequence[int] = (60, 78, 92, 105)
    lr_drop_factor: float = 0.2
    epochs: int = 120
    batch_size: int = 16              # global batch
    square_length: int = 512
    loss_explosion_guard: float = 1e8  # skip batches with larger loss
    checkpoint_dir: str = 'checkpoints'
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class AugmentationConfig:
    """Warp-affine + photometric augmentation bounds (reference data/factory.py:64-106)."""
    square_length: int = 512
    flip_prob: float = 0.5
    max_rotate: float = 45.0
    min_scale: float = 0.5
    max_scale: float = 2.0
    min_stretch: float = 0.95
    max_stretch: float = 1.05
    max_translate: int = 150
    gray_prob: float = 0.02
    color_tint_prob: float = 0.2
    annotation_jitter_prob: float = 0.2


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation harness (reference evaluate.py:36-118)."""
    long_edge: int = 640
    fixed_height: bool = False        # RescaleHighAbsolute+RightDownPad path
    max_stride: int = 128             # padding multiple for fixed-height mode
    # fixed-height width padding bucket (multiple of max_stride): caps the
    # number of distinct jit compilations per epoch at max_width/width_bucket
    width_bucket: int = 256
    flip_test: bool = True
    batch_size: int = 8
    cat_flip_offsets: bool = False
    # host-side parallelism: IO/preprocess threads feeding the device loop
    # (cv2 releases the GIL in imread/warp; the reference gets the same
    # overlap from DataLoader workers, evaluate.py:171-182)
    io_workers: int = 4
