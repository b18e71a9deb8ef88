"""End-to-end pose decoding pipeline: one jitted XLA program per batch shape.

TPU-native counterpart of the reference PostProcess orchestrator
(decoder/factory.py:21-146): flip-test merging, heatmap/offset upsampling,
candidate limb collection and greedy grouping all fuse into a single
device-side computation -- no `.cpu().numpy()` hop, no multiprocessing pool.

Two decode resolutions are supported:
- `upsampled_decode=True` (reference parity): heatmaps are enlarged x stride
  with torch-compatible bicubic before peak finding, exactly like
  decoder/factory.py:74-88. Costs HBM bandwidth on (N, H*4, W*4, C) maps.
- `upsampled_decode=False` (fast path): peaks are found at stride resolution
  and mapped to input coordinates through the encoder's grid-center alignment
  (i*stride + stride/2 - 0.5); the jitter-offset head recovers the sub-stride
  precision the reference gets from bicubic upsampling.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import DecoderConfig, SkeletonConfig
from ..ops import decoder as dec_ops
from ..ops import grouping
from ..ops.resize import upsample2d


@dataclasses.dataclass(frozen=True)
class PostProcessor:
    """Builds and caches the jitted decode function for a skeleton+config."""
    skeleton: SkeletonConfig = dataclasses.field(
        default_factory=SkeletonConfig)
    cfg: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)

    def __post_init__(self):
        jf, jt = np.asarray(self.skeleton.skeleton, dtype=np.int32).T
        object.__setattr__(self, '_jf', tuple(int(v) for v in jf))
        object.__setattr__(self, '_jt', tuple(int(v) for v in jt))
        kp_flip = self.skeleton.heatmap_flip_indices()
        limb_flip, reserve = self.skeleton.offset_flip_indices()
        object.__setattr__(self, '_kp_flip', tuple(int(v) for v in kp_flip))
        object.__setattr__(self, '_limb_flip', tuple(int(v) for v in limb_flip))
        object.__setattr__(self, '_reserve', tuple(int(v) for v in reserve))

    # ------------------------------------------------------------------ #
    def select_stage(self, preds: Dict[str, List]) -> Dict[str, jax.Array]:
        """Pick one stack's maps (reference decoder/factory.py:52-63)."""
        stage = self.cfg.feat_stage
        return {k: (preds[k][stage] if preds[k][stage] is not None else None)
                for k in ('hmp', 'jomp', 'omp', 'scmp')}

    def flip_merge(self, maps: Dict[str, Optional[jax.Array]]
                   ) -> Dict[str, Optional[jax.Array]]:
        """Merge a flip-test doubled batch (reference decoder/factory.py:98-146).

        The batch is [originals; W-flipped inputs]. Flipped heatmaps are
        un-flipped and channel-permuted then averaged; offsets additionally
        negate x components and permute limb channels, with direction-reversed
        limbs (`reserve`) keeping the original prediction only.
        """
        hmp = maps['hmp']
        n2 = hmp.shape[0]
        n = n2 // 2
        kp_flip = list(self._kp_flip)

        def unflip(x):
            return jnp.flip(x[n:], axis=2)   # W axis in NHWC

        out = {}
        out['hmp'] = (hmp[:n] + unflip(hmp)[..., kp_flip]) / 2

        if maps['jomp'] is not None:
            fj = unflip(maps['jomp'])
            fj = fj.at[..., 0].multiply(-1.0)
            out['jomp'] = (maps['jomp'][:n] + fj) / 2
        else:
            out['jomp'] = None

        off = maps['omp']
        h, w = off.shape[1:3]
        L = off.shape[-1] // 2
        off5 = off.reshape(n2, h, w, L, 2)
        orig = off5[:n]
        flip = jnp.flip(off5[n:], axis=2)
        flip = flip.at[..., 0].multiply(-1.0)
        flip = flip[..., list(self._limb_flip), :]
        if self.cfg.cat_flip_offs:
            # 4-D flip merge: keep both offset vectors instead of averaging;
            # direction-reversed limbs duplicate the original vector
            # (reference decoder/factory.py:115-127). Downstream pairing
            # then uses the 4-D distance (collect.py vector_nd=4).
            cat = jnp.concatenate([orig, flip], axis=-1)   # (N, h, w, L, 4)
            if len(self._reserve):
                r = list(self._reserve)
                cat = cat.at[..., r, 2:4].set(orig[..., r, :])
            out['omp'] = cat.reshape(n, h, w, 4 * L)
        else:
            merged = (orig + flip) / 2
            if len(self._reserve):
                merged = merged.at[..., list(self._reserve), :].set(
                    orig[..., list(self._reserve), :])
            out['omp'] = merged.reshape(n, h, w, 2 * L)

        if maps['scmp'] is not None:
            fs = unflip(maps['scmp'])[..., kp_flip]
            out['scmp'] = (maps['scmp'][:n] + fs) / 2
        else:
            out['scmp'] = None
        return out

    # ------------------------------------------------------------------ #
    def decode(self, preds: Dict[str, List], flip_test: bool = False):
        """preds (PoseNet output) -> (poses, scores, counts).

        poses: (N, max_poses, J, 6) in *network input* pixel coordinates.
        """
        return _decode_impl(self, preds, flip_test)

    def _decode_body(self, preds, flip_test):
        packed = self.decode_packed_limbs(preds, flip_test)
        cfg = self.cfg
        use_pallas = (cfg.pallas_grouping == 'on'
                      or (cfg.pallas_grouping == 'auto'
                          and jax.default_backend() == 'tpu'))
        if use_pallas:
            from ..ops.pallas.grouping_pallas import group_skeletons_pallas
            poses, scores, counts = group_skeletons_pallas(
                packed, tuple(zip(self._jf, self._jt)), cfg,
                n_keypoints=self.skeleton.n_keypoints,
                capacity=cfg.capacity)
        else:
            poses, scores, counts = grouping.group_skeletons(
                packed, tuple(zip(self._jf, self._jt)), cfg,
                n_keypoints=self.skeleton.n_keypoints,
                capacity=cfg.capacity)
        return poses, scores, counts

    def decode_packed_limbs(self, preds, flip_test=False):
        """preds -> (N, L, K, 13) packed candidate limbs (the grouping
        input). Exposed so tests/tools can A/B alternative grouping
        semantics on identical candidates."""
        maps = self.select_stage(preds)
        if flip_test:
            maps = self.flip_merge(maps)

        cfg = self.cfg
        s = cfg.stride
        hmp, omp = maps['hmp'], maps['omp']
        jomp, scmp = maps['jomp'], maps['scmp']
        if not cfg.use_jitter_offset:
            jomp = None
        if cfg.scored_offset:
            # heatmap-weighted offset refinement at stride resolution, before
            # any upsampling (reference decoder/factory.py:70-72, kernel 3)
            omp = dec_ops.scored_offset(hmp, omp, np.asarray(self._jf),
                                        kernel_size=3)

        use_pallas = (cfg.pallas_grouping == 'on'
                      or (cfg.pallas_grouping == 'auto'
                          and jax.default_backend() == 'tpu'))
        if cfg.upsampled_decode:
            # the fused kernel's parity-plane NMS is a fixed 3x3 window;
            # other nms_kernel sizes must take the XLA chain (which honors
            # cfg.nms_kernel) on every backend
            if (use_pallas and hmp.shape[1] == hmp.shape[2]
                    and cfg.nms_kernel == 3):
                # fused peaks kernel: bicubic upsample + NMS + block-max +
                # top-k in one Pallas program, full-res map never in HBM
                limbs = dec_ops.collect_limbs_peak_fused(
                    hmp, omp, np.asarray(self._jf), np.asarray(self._jt),
                    cfg, jomps4=jomp, scmps4=scmp, stride=s)
            else:
                # only heatmaps are physically upsampled (peak finding needs
                # the bicubic surface); aux maps are interpolated at the K
                # peaks only. Shift-path formulation (exact f32 VPU FMAs,
                # same term order as the fused kernel and the peak
                # sampling -- the MXU matmul form needs precision='highest'
                # to avoid bf16 truncation and is slower at that setting).
                hmp_up = upsample2d(hmp, s, cfg.resize_mode)
                limbs = dec_ops.collect_limbs_peak_sampled(
                    hmp_up, omp, np.asarray(self._jf), np.asarray(self._jt),
                    cfg, jomps4=jomp, scmps4=scmp, stride=s)
            packed = dec_ops.pack_limbs(limbs)
        else:
            # decode at stride resolution; map cell indices to input pixels
            limbs = dec_ops.collect_limbs(
                hmp, omp / float(s), np.asarray(self._jf),
                np.asarray(self._jt), cfg, jomps=None, scmps=scmp)
            packed = dec_ops.pack_limbs(limbs)
            # cell -> input coordinates: x_in = x_cell * s + s/2 - 0.5 for
            # on-image candidates (off-image sentinels stay far negative)
            shift = s / 2 - 0.5
            xy_cols = jnp.array([0, 1, 3, 4])
            coords = packed[..., xy_cols]
            coords = jnp.where(coords > -1000.0, coords * s + shift, coords)
            packed = packed.at[..., xy_cols].set(coords)
            # distances/lengths computed in cell units -> rescale
            packed = packed.at[..., 8].multiply(float(s))
            packed = packed.at[..., 9].multiply(float(s))
            if jomp is not None:
                # refine with jitter offsets gathered at stride resolution
                packed = self._apply_jitter_lowres(packed, jomp, limbs)
        return packed

    def _apply_jitter_lowres(self, packed, jomp, limbs):
        """Add jitter offsets (input-res units) at low-res peak positions."""
        n, h, w, _ = jomp.shape
        L, k = limbs.ind_f.shape[1:]
        page = h * w
        flat = jomp.reshape(n, page, 2)

        def gather(ind):                       # ind (N, L, K) global index
            idx = (ind % page).reshape(n, L * k, 1)
            v = jnp.take_along_axis(
                flat, jnp.broadcast_to(idx, (n, L * k, 2)), axis=1)
            return v.reshape(n, L, k, 2)

        packed = packed.at[..., 0:2].add(gather(limbs.ind_f))
        packed = packed.at[..., 3:5].add(gather(limbs.ind_t))
        return packed


@functools.partial(jax.jit, static_argnums=(0, 2))
def _decode_impl(pp: PostProcessor, preds, flip_test: bool):
    return pp._decode_body(preds, flip_test)
