"""Strict behavioral port of the reference greedy grouping — TEST ORACLE ONLY.

Replicates `/root/reference/decoder/group.py:39-246` semantics exactly,
INCLUDING its implementation accidents (which offsetguided_tpu deliberately
refines — see ops/grouping_ref.py docstring):

- numpy fancy-assignment last-write-wins: when several same-type limbs can
  extend one skeleton, the LAST (after sort-by-score: lowest-scoring)
  candidate wins (group.py:124-135);
- the max-update of the limb-score column uses the PRE-assignment value, so
  with several candidates only the last one's max survives (group.py:133-134);
- ALL mask_sum==2 / ==1 entries are set to -1 when any replace-qualified one
  exists (group.py:119,135) — entries that did not qualify included — which
  feeds the accidental column-sum==0 "new skeleton" criterion (group.py:166);
- skeleton merging resolves ALL ==2 pairs in one shot from the pre-merge
  snapshot: duplicate targets keep only the last mergee's content and chains
  (a<-b, b<-c) lose c's keypoints (group.py:140-155);
- >=3 shared joints are ignored (group.py:158-161).

This module exists so tests can quantify exactly where and how much the
shipping implementations diverge from the reference. Do not use outside
tests.
"""
from __future__ import annotations

import numpy as np


def _delete_reconns_strict(conns: np.ndarray) -> np.ndarray:
    """Sort by descending limb score (stable), keep first use of each end
    keypoint index (group.py:221-240)."""
    conns = conns[np.argsort(-conns[:, 10], kind='stable')]
    seen, keep = set(), []
    for j, it in enumerate(conns[:, 7].astype(np.int64)):
        if it not in seen:
            seen.add(it)
            keep.append(j)
    return conns[keep]


def group_skeletons_strict(limbs: np.ndarray, skeleton, *, person_thre=0.06,
                           sort_dim=2, dist_max=20.0, use_scale=True,
                           n_keypoints=17, max_poses=64):
    """(L, K, 13) candidate limbs -> (poses (M, J, 6), scores (M,))."""
    J = n_keypoints
    subset = -np.ones((0, J, 6), dtype=np.float64)

    for (jf, jt), conns_l in zip(skeleton, limbs):
        conns = np.asarray(conns_l, dtype=np.float64)
        if use_scale:
            dist_valid = conns[:, 8] < np.maximum(dist_max, conns[:, 12])
        else:
            dist_valid = conns[:, 8] < dist_max
        valid = (dist_valid & (conns[:, 0] > 0) & (conns[:, 4] > 0)
                 & (conns[:, 3] > 0) & (conns[:, 1] > 0))
        conns = _delete_reconns_strict(conns[valid])
        kk, mm = len(conns), len(subset)
        if kk == 0:
            continue

        jid = subset[:, [jf, jt], 5].astype(np.int64)
        sub_sc = subset[:, [jf, jt], 4]
        ind1 = conns[:, 6].astype(np.int64)
        ind2 = conns[:, 7].astype(np.int64)
        xyvs1 = conns[:, [0, 1, 2, 11]]
        xyvs2 = conns[:, [3, 4, 5, 12]]
        score = conns[:, 10]

        mask_sum = ((jid[:, 0:1] == ind1[None, :]).astype(np.int64)
                    + (jid[:, 1:2] == ind2[None, :]).astype(np.int64))
        replace = (score[None, :] > sub_sc[:, 1:2]) | \
                  (score[None, :] > sub_sc[:, 0:1])

        # redundant limb in an existing skeleton (mask_sum == 2)
        Ms, Ks = np.nonzero((mask_sum == 2) & replace)
        if len(Ms):
            old_f = subset[:, jf, 4].copy()
            old_t = subset[:, jt, 4].copy()
            for m, k in zip(Ms, Ks):      # last write wins, vs PRE-state max
                subset[m, jf, 4] = max(score[k], old_f[m])
                subset[m, jt, 4] = max(score[k], old_t[m])
            mask_sum[mask_sum == 2] = -1  # ALL 2s, qualified or not

        # extend skeletons sharing exactly one joint (mask_sum == 1)
        Ms, Ks = np.nonzero((mask_sum == 1) & replace)
        if len(Ms):
            old_f = subset[:, jf, 4].copy()
            old_t = subset[:, jt, 4].copy()
            for m, k in zip(Ms, Ks):      # duplicates: LAST candidate wins
                subset[m, jf, 5] = ind1[k]
                subset[m, jt, 5] = ind2[k]
                subset[m, jf, :4] = xyvs1[k]
                subset[m, jt, :4] = xyvs2[k]
                subset[m, jf, 4] = max(score[k], old_f[m])
                subset[m, jt, 4] = max(score[k], old_t[m])
            mask_sum[mask_sum == 1] = -1  # ALL 1s, qualified or not

        # merge pairs sharing exactly two keypoint inds: all pairs at once,
        # from the pre-merge snapshot (chains/duplicate targets lose data)
        if mm >= 2:
            inds = subset[:, :, 5].astype(np.int64)
            n = len(subset)
            cnt = np.zeros((n, n), dtype=np.int64)
            for a in range(n):
                for b in range(a + 1, n):
                    cnt[a, b] = int(np.sum((inds[a] == inds[b])
                                           & (inds[a] != -1)))
            As, Bs = np.nonzero(cnt == 2)
            if len(As):
                snap = subset.copy()
                for a, b in zip(As, Bs):
                    subset[a] = np.maximum(snap[a], snap[b])
                subset = np.delete(subset, np.unique(Bs), axis=0)
            # cnt >= 3: the reference prints a notice and does nothing

        # new skeletons: columns whose (post-masking) row sums are zero
        new_ks = np.nonzero(mask_sum.sum(axis=0) == 0)[0] if mm else \
            np.arange(kk)
        for k in new_ks:
            row = -np.ones((1, J, 6))
            row[0, jf, 5] = ind1[k]
            row[0, jt, 5] = ind2[k]
            row[0, jf, :4] = xyvs1[k]
            row[0, jt, :4] = xyvs2[k]
            row[0, jf, 4] = score[k]
            row[0, jt, 4] = score[k]
            subset = np.concatenate([subset, row], axis=0)

    # delete/sort (group.py:187-219): score = mean of positive sort_dim col
    scores, keep = [], []
    for i in range(len(subset)):
        mask = subset[i, :, sort_dim] > 0
        s = subset[i, mask, sort_dim].sum() / mask.sum() if mask.any() else 0.0
        if s >= person_thre:
            keep.append(i)
            scores.append(s)
    order = np.argsort(-np.asarray(scores), kind='stable') if scores else []
    out = (subset[np.asarray(keep, np.int64)][order] if keep
           else np.zeros((0, J, 6)))
    out = out[:max_poses]
    out[out == -1] = 0
    fs = (np.asarray(scores)[order][:max_poses] if keep
          else np.zeros((0,)))
    return out, fs
