"""Greedy skeleton grouping as fixed-shape, jittable on-device computation.

The reference runs grouping per image in NumPy inside a multiprocessing pool
(decoder/group.py:39-185, decoder/factory.py:92-94) -- a device->host round
trip the BASELINE.json north-star requires eliminating. Here the data-dependent
control flow (grow/merge/delete skeleton lists, `nonzero` scatters) is
reformulated over a fixed capacity of `capacity` skeleton rows with validity
masks:

- per limb type (static python unroll over the skeleton -- joint ids become
  compile-time constants, so all scatters have static column indices),
- candidate validity + one-use-per-end-keypoint dedup via (K, K) masks,
- skeleton matching via dense (M, K) index-equality counts,
- extension/redundant updates via masked scatters (best-scoring candidate wins,
  see grouping_ref.py for the two documented tie-break refinements),
- merging via (M, M) shared-ind counts,
- new rows allocated from free slots through an argsort-based free list.

Everything is O(L*(M*K + M^2 + K^2)) dense arithmetic on tiny tensors, which
XLA compiles into one fused program; `jax.vmap` batches over images.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..config.defaults import DecoderConfig

COL_X, COL_Y, COL_V, COL_S, COL_LSC, COL_IND = range(6)


def _dedup_end_keypoints(ind_t, score, valid):
    """Keep, per distinct end keypoint, the valid conn with the highest limb
    score (ties -> lowest index). (K,) bool."""
    k = ind_t.shape[0]
    ar = jnp.arange(k)
    same = ind_t[:, None] == ind_t[None, :]
    better = (score[None, :] > score[:, None]) | (
        (score[None, :] == score[:, None]) & (ar[None, :] < ar[:, None]))
    beaten = (valid[None, :] & same & better).any(axis=1)
    return valid & ~beaten


def _merge_pass(subset, used):
    """One merge iteration: rows sharing exactly two keypoint inds fold into
    the first (lowest-index) matching target row; at most one mergee per
    target per pass (chains settle on subsequent passes)."""
    M = subset.shape[0]
    inds = subset[:, :, COL_IND]
    shared = ((inds[:, None, :] == inds[None, :, :])
              & (inds[:, None, :] != -1.0)).sum(axis=-1)        # (M, M)
    ar = jnp.arange(M)
    upper = ar[:, None] < ar[None, :]
    mergeable = (shared == 2) & upper & used[:, None] & used[None, :]
    has_target = mergeable.any(axis=0)          # b has some a<b to merge into
    a_sel = jnp.argmax(mergeable, axis=0)       # first matching target row
    # a row that is itself being merged away cannot receive a merge
    a_is_mergee = has_target[a_sel]
    do_merge = has_target & ~a_is_mergee
    # one mergee per target row per pass (extra pairs settle on later
    # passes; keeps parity with the Pallas kernel formulation)
    T = (ar[:, None] == a_sel[None, :]) & do_merge[None, :]   # (Ma, Mb)
    first_b = jnp.argmax(T, axis=1)
    hasb = T.any(axis=1)
    consumed = (jnp.zeros((M,), jnp.int32)
                .at[first_b].add(hasb.astype(jnp.int32)) > 0)
    contrib = jnp.where(consumed[:, None, None], subset,
                        -jnp.inf)                               # (M, J, 6)
    tgt = jnp.where(consumed, a_sel, M)          # OOB -> dropped
    subset = subset.at[tgt].max(contrib, mode='drop')
    subset = jnp.where(consumed[:, None, None], -1.0, subset)
    used = used & ~consumed
    return subset, used


def _group_single(packed, skeleton, cfg: DecoderConfig, n_keypoints: int,
                  capacity: int):
    """Group one image's (L, K, 13) candidate limbs. See pack_limbs for columns."""
    J = n_keypoints
    M = capacity
    subset = jnp.full((M, J, 6), -1.0, dtype=jnp.float32)
    used = jnp.zeros((M,), dtype=bool)

    for l, (jf, jt) in enumerate(skeleton):
        conns = packed[l].astype(jnp.float32)  # (K, 13)
        x1, y1, v1 = conns[:, 0], conns[:, 1], conns[:, 2]
        x2, y2, v2 = conns[:, 3], conns[:, 4], conns[:, 5]
        ind1, ind2 = conns[:, 6], conns[:, 7]
        delta, score = conns[:, 8], conns[:, 10]
        scale1, scale2 = conns[:, 11], conns[:, 12]

        if cfg.use_scale:
            dist_valid = delta < jnp.maximum(cfg.dist_max, scale2)
        else:
            dist_valid = delta < cfg.dist_max
        valid = dist_valid & (x1 > 0) & (y1 > 0) & (x2 > 0) & (y2 > 0)
        keep = _dedup_end_keypoints(ind2, score, valid)

        # --- match kept conns against existing skeletons --------------------
        jid_f, jid_t = subset[:, jf, COL_IND], subset[:, jt, COL_IND]  # (M,)
        row_gate = used[:, None] & keep[None, :]
        m1 = (jid_f[:, None] == ind1[None, :]) & row_gate
        m2 = (jid_t[:, None] == ind2[None, :]) & row_gate
        mask_sum = m1.astype(jnp.int32) + m2.astype(jnp.int32)      # (M, K)
        sub_sc_f, sub_sc_t = subset[:, jf, COL_LSC], subset[:, jt, COL_LSC]
        replace = (score[None, :] > sub_sc_t[:, None]) | (
            score[None, :] > sub_sc_f[:, None])

        # --- redundant limb inside one skeleton: refresh limb scores --------
        upd2 = (mask_sum == 2) & replace
        best2 = jnp.max(jnp.where(upd2, score[None, :], -jnp.inf), axis=1)
        have2 = upd2.any(axis=1)
        for col in (jf, jt):
            old = subset[:, col, COL_LSC]
            subset = subset.at[:, col, COL_LSC].set(
                jnp.where(have2, jnp.maximum(old, best2), old))

        # --- extend skeletons sharing exactly one joint ---------------------
        cand = (mask_sum == 1) & replace
        have1 = cand.any(axis=1)
        k_sel = jnp.argmax(jnp.where(cand, score[None, :], -jnp.inf), axis=1)
        g = lambda v: v[k_sel]  # (M,) gathered candidate fields
        sel_score = g(score)
        for col, ind_v, xv, yv, vv, sv in (
                (jf, g(ind1), g(x1), g(y1), g(v1), g(scale1)),
                (jt, g(ind2), g(x2), g(y2), g(v2), g(scale2))):
            row = subset[:, col, :]
            new_row = row
            new_row = new_row.at[:, COL_IND].set(ind_v)
            new_row = new_row.at[:, COL_X].set(xv)
            new_row = new_row.at[:, COL_Y].set(yv)
            new_row = new_row.at[:, COL_V].set(vv)
            new_row = new_row.at[:, COL_S].set(sv)
            new_row = new_row.at[:, COL_LSC].set(
                jnp.maximum(row[:, COL_LSC], sel_score))
            subset = subset.at[:, col, :].set(
                jnp.where(have1[:, None], new_row, row))

        # --- merge skeleton pairs sharing exactly two keypoint inds ---------
        subset, used = _merge_pass(subset, used)

        # --- new skeletons from unmatched conns -----------------------------
        untouched = (mask_sum == 0).all(axis=0)
        new_k = keep & untouched
        new_rank = jnp.cumsum(new_k.astype(jnp.int32)) - 1          # (K,)
        free_rows = jnp.argsort(used.astype(jnp.int32), stable=True)
        n_free = M - used.sum()
        slot = jnp.where(new_k & (new_rank < n_free),
                         free_rows[jnp.clip(new_rank, 0, M - 1)], M)
        for col, ind_v, xv, yv, vv, sv in (
                (jf, ind1, x1, y1, v1, scale1),
                (jt, ind2, x2, y2, v2, scale2)):
            subset = subset.at[slot, col, COL_IND].set(ind_v, mode='drop')
            subset = subset.at[slot, col, COL_X].set(xv, mode='drop')
            subset = subset.at[slot, col, COL_Y].set(yv, mode='drop')
            subset = subset.at[slot, col, COL_V].set(vv, mode='drop')
            subset = subset.at[slot, col, COL_S].set(sv, mode='drop')
            subset = subset.at[slot, col, COL_LSC].set(score, mode='drop')
        used = used.at[slot].set(True, mode='drop')

    # settle merge chains the per-iteration one-mergee-per-target rule left
    # unresolved at the final limb (see DecoderConfig.settle_passes)
    for _ in range(cfg.settle_passes):
        subset, used = _merge_pass(subset, used)

    return _delete_sort(subset, used, cfg, n_keypoints)


def _delete_sort(subset, used, cfg: DecoderConfig, n_keypoints: int):
    """Score, filter, sort and compact (reference: decoder/group.py:187-219)."""
    M = subset.shape[0]
    vals = subset[:, :, cfg.sort_dim]
    pos = (vals > 0) & used[:, None]
    npos = pos.sum(axis=1)
    score = jnp.where(npos > 0, (vals * pos).sum(axis=1) / jnp.maximum(npos, 1), 0.0)
    keep = used & (score >= cfg.person_thre)
    sort_key = jnp.where(keep, score, -1.0)
    order = jnp.argsort(-sort_key, stable=True)[:cfg.max_poses]
    out = subset[order]
    out_keep = keep[order]
    out = jnp.where(out_keep[:, None, None], out, 0.0)
    out = jnp.where(out == -1.0, 0.0, out)
    out_scores = jnp.where(out_keep, score[order], 0.0)
    return out, out_scores, keep.sum()


@functools.partial(jax.jit, static_argnames=('skeleton', 'cfg', 'n_keypoints',
                                             'capacity'))
def group_skeletons(packed_limbs: jax.Array, skeleton: Sequence,
                    cfg: DecoderConfig, n_keypoints: int = 17,
                    capacity: int = 64):
    """Batched greedy grouping.

    Args:
        packed_limbs: (N, L, K, 13) candidate limbs (see decoder.pack_limbs).
        skeleton: static tuple of (from_joint, to_joint) pairs.
    Returns:
        poses: (N, max_poses, n_keypoints, 6) sorted by descending score,
               columns [x, y, v, scale, limb_score, global_ind], zero padded.
        scores: (N, max_poses) person scores (0 for empty slots).
        counts: (N,) number of valid poses.
    """
    fn = functools.partial(_group_single, skeleton=tuple(map(tuple, skeleton)),
                           cfg=cfg, n_keypoints=n_keypoints, capacity=capacity)
    return jax.vmap(fn)(packed_limbs)
