"""Sequential NumPy reference for greedy skeleton grouping (testing only).

This is the semantic specification of our fixed-shape grouping reformulation.
It re-derives the reference algorithm (decoder/group.py:39-246) from its
behavior, with two deliberate, documented refinements where the original is
order-dependent:

1. When several limbs of the same type can extend the same skeleton at exactly
   one shared joint, we attach the one with the *highest* limb score. (The
   reference's vectorized numpy fancy-assignment lets the *last* write win,
   which after its sort-by-score ordering is the lowest-scoring candidate --
   an accident of implementation, decoder/group.py:124-135.)
2. Skeleton merging resolves each mergee row to the first (lowest-index)
   matching target row; chains settle over subsequent limb iterations plus
   `settle_passes` merge-only passes after the last limb. (The reference
   merges all pairs at once from a pre-merge snapshot, which LOSES chained
   mergees' keypoints, decoder/group.py:140-155; settling converges to the
   lossless transitive closure instead. Divergence quantified in
   tests/test_grouping_adversarial.py.)

Everything else -- validity gating, one-use-per-end-keypoint dedup, the
match/replace criteria, redundant-limb max-updates, merge-on-two-shared-joints,
new-skeleton creation and the final delete/sort -- follows the reference
exactly.
"""
from __future__ import annotations

import numpy as np

COL_X, COL_Y, COL_V, COL_S, COL_LSC, COL_IND = range(6)


def delete_reconns(conns: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """One end-keypoint may be claimed by only one limb of a given type: keep,
    per distinct end index, the valid connection with the highest limb score
    (ties -> lowest candidate index). Returns the keep mask.
    (reference: decoder/group.py:221-240)"""
    k = conns.shape[0]
    keep = valid.copy()
    score = conns[:, 10]
    ind_t = conns[:, 7].astype(np.int64)
    for a in range(k):
        if not keep[a]:
            continue
        for b in range(k):
            if b == a or not valid[b] or ind_t[b] != ind_t[a]:
                continue
            if score[b] > score[a] or (score[b] == score[a] and b < a):
                keep[a] = False
                break
    return keep


def _merge_pass_ref(subset: np.ndarray):
    """One merge iteration, mirroring the device formulation EXACTLY
    (ops/grouping.py::_merge_pass): each mergee row b targets only its FIRST
    (lowest-index) matching row a; b is deferred to a later pass when that
    target is itself a potential mergee, or when the target already received
    a lower-indexed mergee this pass. Returns (subset, n_merged)."""
    inds = subset[:, :, COL_IND].astype(np.int64)
    n_rows = len(subset)
    cnt = np.zeros((n_rows, n_rows), dtype=np.int64)
    for a in range(n_rows):
        for b in range(a + 1, n_rows):
            cnt[a, b] = int(np.sum((inds[a] == inds[b]) & (inds[a] != -1)))
    a_sel = {}
    for b in range(n_rows):
        for a in range(b):
            if cnt[a, b] == 2:
                a_sel[b] = a          # first matching target only
                break
    has_target = set(a_sel)
    dead, receivers = [], set()
    for b in sorted(a_sel):
        a = a_sel[b]
        if a in has_target:           # target is itself a (potential) mergee
            continue
        if a in receivers:            # one mergee per target per pass
            continue
        subset[a] = np.maximum(subset[a], subset[b])
        receivers.add(a)
        dead.append(b)
    if dead:
        subset = np.delete(subset, dead, axis=0)
    return subset, len(dead)


def group_skeletons_ref(limbs: np.ndarray, skeleton, *, person_thre=0.06,
                        sort_dim=2, dist_max=20.0, use_scale=True,
                        n_keypoints=17, max_poses=64, settle_passes=2):
    """Group one image's candidate limbs (L, K, 13) into skeletons.

    Returns (poses (M, n_keypoints, 6), scores (M,)) sorted descending.
    """
    subset = -np.ones((0, n_keypoints, 6), dtype=np.float64)

    for l, (jf, jt) in enumerate(skeleton):
        conns = limbs[l].astype(np.float64)
        if use_scale:
            dist_valid = conns[:, 8] < np.maximum(dist_max, conns[:, 12])
        else:
            dist_valid = conns[:, 8] < dist_max
        valid = (dist_valid & (conns[:, 0] > 0) & (conns[:, 1] > 0)
                 & (conns[:, 3] > 0) & (conns[:, 4] > 0))
        keep = delete_reconns(conns, valid)
        kept = np.flatnonzero(keep)
        if kept.size == 0:
            continue

        mm = len(subset)
        jid = subset[:, [jf, jt], COL_IND].astype(np.int64) if mm else \
            np.zeros((0, 2), np.int64)
        sub_scores = subset[:, [jf, jt], COL_LSC] if mm else np.zeros((0, 2))

        ind1 = conns[:, 6].astype(np.int64)
        ind2 = conns[:, 7].astype(np.int64)
        mask_sum = np.zeros((mm, conns.shape[0]), dtype=np.int64)
        for m in range(mm):
            for k in kept:
                mask_sum[m, k] = int(jid[m, 0] == ind1[k]) + int(jid[m, 1] == ind2[k])
        replace = np.zeros_like(mask_sum, dtype=bool)
        for m in range(mm):
            for k in kept:
                replace[m, k] = (conns[k, 10] > sub_scores[m, 1]
                                 or conns[k, 10] > sub_scores[m, 0])

        # redundant limb inside an existing skeleton: refresh limb scores
        for m in range(mm):
            for k in kept:
                if mask_sum[m, k] == 2 and replace[m, k]:
                    subset[m, jf, COL_LSC] = max(subset[m, jf, COL_LSC], conns[k, 10])
                    subset[m, jt, COL_LSC] = max(subset[m, jt, COL_LSC], conns[k, 10])

        # extend skeletons sharing exactly one joint: best-scoring candidate
        for m in range(mm):
            cands = [k for k in kept if mask_sum[m, k] == 1 and replace[m, k]]
            if not cands:
                continue
            k = max(cands, key=lambda kk: conns[kk, 10])
            subset[m, jf, COL_IND] = ind1[k]
            subset[m, jt, COL_IND] = ind2[k]
            subset[m, jf, :4] = conns[k, [0, 1, 2, 11]]
            subset[m, jt, :4] = conns[k, [3, 4, 5, 12]]
            subset[m, jf, COL_LSC] = max(subset[m, jf, COL_LSC], conns[k, 10])
            subset[m, jt, COL_LSC] = max(subset[m, jt, COL_LSC], conns[k, 10])

        # merge pairs of skeletons that now share exactly two keypoint inds
        if len(subset) >= 2:
            subset, _ = _merge_pass_ref(subset)

        # conns touching no existing skeleton spawn new rows
        new_ks = [k for k in kept
                  if (mask_sum[:, k] == 0).all()] if mm else list(kept)
        for k in new_ks:
            row = -np.ones((1, n_keypoints, 6))
            row[0, jf, COL_IND] = ind1[k]
            row[0, jt, COL_IND] = ind2[k]
            row[0, jf, :4] = conns[k, [0, 1, 2, 11]]
            row[0, jt, :4] = conns[k, [3, 4, 5, 12]]
            row[0, jf, COL_LSC] = conns[k, 10]
            row[0, jt, COL_LSC] = conns[k, 10]
            subset = np.concatenate([subset, row], axis=0)

    # settle merge chains left unresolved by the one-mergee-per-target rule
    # at the final limb (matches DecoderConfig.settle_passes on device)
    for _ in range(settle_passes):
        if len(subset) < 2:
            break
        subset, n_merged = _merge_pass_ref(subset)
        if not n_merged:
            break

    return delete_sort_ref(subset, person_thre, sort_dim, max_poses)


def soft_nms(poses: np.ndarray, suppressed_v: float = 0.0) -> np.ndarray:
    """Pose-level occupancy suppression (reference decoder/group.py:249-283).

    Walks poses in order, marking square regions around claimed keypoints;
    later keypoints landing on occupied cells get their visibility zeroed.
    The reference notes it "makes no difference" for Gaussian-spread models
    and leaves it disabled; provided for capability parity.
    """
    poses = np.array(poses, copy=True)
    if not len(poses):
        return poses
    h = int(max(p[:, 1].max() for p in poses) + 1)
    w = int(max(p[:, 0].max() for p in poses) + 1)
    occupied = np.zeros((poses.shape[1], max(h, 1), max(w, 1)), dtype=np.uint8)
    for pose in poses:
        joint_scales = np.maximum(10.0, pose[:, 3])
        for j, (xyv, js) in enumerate(zip(pose[:, :3], joint_scales)):
            if xyv[2] <= 0:
                continue
            x = int(np.clip(xyv[0], 0, w - 1))
            y = int(np.clip(xyv[1], 0, h - 1))
            if occupied[j, y, x]:
                pose[j, 2] = suppressed_v
            else:
                x0, y0 = max(0, int(xyv[0] - js)), max(0, int(xyv[1] - js))
                x1 = max(x0 + 1, min(w, int(xyv[0] + js) + 1))
                y1 = max(y0 + 1, min(h, int(xyv[1] + js) + 1))
                occupied[j, y0:y1, x0:x1] += 1
    return poses


def delete_sort_ref(subset, thre, sort_dim, max_poses):
    """Score, filter and sort skeletons (reference: decoder/group.py:187-219)."""
    scores = []
    keep = []
    for i in range(len(subset)):
        mask = subset[i, :, sort_dim] > 0
        score = subset[i, mask, sort_dim].sum() / mask.sum() if mask.any() else 0.0
        if score >= thre:
            keep.append(i)
            scores.append(score)
    order = np.argsort(-np.asarray(scores), kind='stable') if scores else []
    out = subset[np.asarray(keep, dtype=np.int64)][order] if len(keep) else \
        np.zeros((0, subset.shape[1], 6))
    out = out[:max_poses]
    out[out == -1] = 0
    final_scores = np.asarray(scores, dtype=np.float64)[order][:max_poses] if len(keep) \
        else np.zeros((0,))
    return out, final_scores
