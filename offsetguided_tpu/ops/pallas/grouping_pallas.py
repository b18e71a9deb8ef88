"""Greedy skeleton grouping as a single Pallas TPU kernel.

The XLA formulation (ops/grouping.py) is correct but costs ~10ms/batch: the 19
sequential limb iterations emit hundreds of microscopic HLOs, each paying
kernel-dispatch overhead. Here the whole grouping -- all limb iterations,
merging and the final selection sort -- runs as ONE Pallas program per image
(grid over the batch), with the skeleton statically unrolled and every
data-dependent update expressed through Mosaic-friendly 2D dataflow:

- the skeleton state lives in a flat (M, J*6) matrix; per-joint updates are
  static column-slice concatenations,
- candidate row gathers and skeleton merges are one-hot matmuls,
- free-slot allocation is a rank-matching matrix between free rows and new
  connections (cumsum via triangular masked sums),
- the final sort is an iterative masked argmax,
- no scatter/gather/argsort primitives, no >2D intermediates, no boolean
  rank-changing reshapes (all unsupported by the Mosaic lowering).

`_group_core` is the kernel-safe dataflow; it implements the algorithm of
grouping._group_single (same tie-breaking; see grouping_ref.py for the spec)
with one further alignment: a merge target row absorbs at most one mergee per
limb iteration (additional pairs settle on later iterations).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...config.defaults import DecoderConfig

COL_LSC, COL_IND = 4, 5


def _iota(n, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (n, 1), 0)[:, 0]


def _cumsum_incl(v):
    """Inclusive cumsum via a triangular masked sum (no matrix-vector dots)."""
    n = v.shape[0]
    tril = (_iota(n)[:, None] >= _iota(n)[None, :]).astype(v.dtype)
    return (tril * v[None, :]).sum(axis=1)


def _onehot(idx, n):
    return (idx[:, None] == _iota(n)[None, :]).astype(jnp.float32)


def _blend_cols(subset, j, new6, gate):
    """subset (M, J*6) with columns [6j, 6j+6) replaced by new6 where gate.

    gate: (M,) float32 in {0, 1}. Static-slice concatenation (no scatter)."""
    old6 = subset[:, 6 * j:6 * j + 6]
    g = gate[:, None]
    mid = old6 * (1.0 - g) + new6 * g
    parts = []
    if j > 0:
        parts.append(subset[:, :6 * j])
    parts.append(mid)
    if 6 * j + 6 < subset.shape[1]:
        parts.append(subset[:, 6 * j + 6:])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _group_core(packed, skeleton, cfg: DecoderConfig, J: int, M: int):
    """One image's (L, K, 13) candidate limbs -> (poses (MP, J*6), scores,
    count). Pure 2D dataflow: safe under jit and inside a Pallas kernel."""
    K = packed.shape[1]
    subset = jnp.full((M, J * 6), -1.0, dtype=jnp.float32)
    used = jnp.zeros((M,), dtype=jnp.float32)       # 1.0 = occupied
    arK = _iota(K)
    arM = _iota(M)

    for l, (jf, jt) in enumerate(skeleton):
        conns = packed[l].astype(jnp.float32)            # (K, 13)
        x1, y1 = conns[:, 0], conns[:, 1]
        x2, y2 = conns[:, 3], conns[:, 4]
        ind1, ind2 = conns[:, 6], conns[:, 7]
        delta, score = conns[:, 8], conns[:, 10]
        scale2 = conns[:, 12]

        if cfg.use_scale:
            dist_valid = delta < jnp.maximum(cfg.dist_max, scale2)
        else:
            dist_valid = delta < cfg.dist_max
        valid = dist_valid & (x1 > 0) & (y1 > 0) & (x2 > 0) & (y2 > 0)

        same = ind2[:, None] == ind2[None, :]
        better = (score[None, :] > score[:, None]) | (
            (score[None, :] == score[:, None]) & (arK[None, :] < arK[:, None]))
        keep = valid & ~(valid[None, :] & same & better).any(axis=1)

        jid_f = subset[:, 6 * jf + COL_IND]
        jid_t = subset[:, 6 * jt + COL_IND]
        row_gate = (used[:, None] > 0.5) & keep[None, :]
        m1 = (jid_f[:, None] == ind1[None, :]) & row_gate
        m2 = (jid_t[:, None] == ind2[None, :]) & row_gate
        mask_sum = m1.astype(jnp.int32) + m2.astype(jnp.int32)
        sub_sc_f = subset[:, 6 * jf + COL_LSC]
        sub_sc_t = subset[:, 6 * jt + COL_LSC]
        replace = (score[None, :] > sub_sc_t[:, None]) | (
            score[None, :] > sub_sc_f[:, None])

        # --- redundant limb inside one skeleton ----------------------------
        upd2 = (mask_sum == 2) & replace
        best2 = jnp.max(jnp.where(upd2, score[None, :], -jnp.inf), axis=1)
        have2 = upd2.any(axis=1).astype(jnp.float32)
        for col in (jf, jt):
            c = 6 * col + COL_LSC
            old = subset[:, c]
            newv = jnp.maximum(old, best2) * have2 + old * (1.0 - have2)
            parts = ([subset[:, :c]] if c > 0 else []) + [newv[:, None]]
            if c + 1 < subset.shape[1]:
                parts.append(subset[:, c + 1:])
            subset = jnp.concatenate(parts, axis=1)

        # --- extend skeletons sharing one joint ----------------------------
        cand = (mask_sum == 1) & replace
        have1 = cand.any(axis=1).astype(jnp.float32)
        k_sel = jnp.argmax(jnp.where(cand, score[None, :], -jnp.inf),
                           axis=1).astype(jnp.int32)
        oh1 = _onehot(k_sel, K)                           # (M, K)
        g = oh1 @ conns                                   # (M, 13)
        sel_score = g[:, 10]
        for col, i0 in ((jf, 0), (jt, 3)):
            old_lsc = subset[:, 6 * col + COL_LSC]
            new6 = jnp.stack([
                g[:, i0 + 0], g[:, i0 + 1], g[:, i0 + 2],
                g[:, 11 + i0 // 3],
                jnp.maximum(old_lsc, sel_score),
                g[:, 6 + i0 // 3]], axis=-1)
            subset = _blend_cols(subset, col, new6, have1)

        # --- merge pairs sharing exactly two keypoint inds -----------------
        inds = jnp.stack([subset[:, 6 * j + COL_IND] for j in range(J)],
                         axis=1)                          # (M, J)
        shared = ((inds[:, None, :] == inds[None, :, :])
                  & (inds[:, None, :] != -1.0)).sum(axis=-1)
        upper = arM[:, None] < arM[None, :]
        mergeable = ((shared == 2) & upper
                     & (used[:, None] > 0.5) & (used[None, :] > 0.5))
        has_target = mergeable.any(axis=0)
        a_sel = jnp.argmax(mergeable.astype(jnp.float32),
                           axis=0).astype(jnp.int32)
        # has_target gathered at a_sel, via one-hot contraction (no gather)
        target_is_mergee = (_onehot(a_sel, M)
                            * has_target[None, :].astype(jnp.float32)
                            ).sum(axis=1) > 0
        do_merge = has_target & ~target_is_mergee         # (M,) mergee rows
        T = (arM[:, None] == a_sel[None, :]) & do_merge[None, :]  # (Ma, Mb)
        # one mergee per target row per iteration (extra pairs settle later)
        first_b = jnp.argmax(T.astype(jnp.float32), axis=1).astype(jnp.int32)
        hasb = T.any(axis=1).astype(jnp.float32)          # (Ma,)
        T1 = _onehot(first_b, M) * hasb[:, None]          # (Ma, Mb) 0/1
        consumed = T1.sum(axis=0)                          # (Mb,) 0/1
        contrib = T1 @ subset                              # (M, J*6)
        merged = jnp.maximum(subset, contrib)
        gm = hasb[:, None]
        subset = merged * gm + subset * (1.0 - gm)
        cm = consumed[:, None]
        subset = subset * (1.0 - cm) + (-1.0) * cm
        used = used * (1.0 - consumed)

        # --- new skeletons from unmatched conns ----------------------------
        untouched = (mask_sum == 0).all(axis=0)
        new_k = (keep & untouched).astype(jnp.float32)
        new_rank = _cumsum_incl(new_k) - 1.0               # (K,)
        free = 1.0 - used
        r_free = _cumsum_incl(free) - 1.0                  # (M,)
        assign = (free[:, None] * new_k[None, :]) * (
            r_free[:, None] == new_rank[None, :]).astype(jnp.float32)
        row_has = jnp.minimum(assign.sum(axis=1), 1.0)     # (M,) 0/1
        vals = assign @ conns                              # (M, 13)
        for col, i0 in ((jf, 0), (jt, 3)):
            new6 = jnp.stack([
                vals[:, i0 + 0], vals[:, i0 + 1], vals[:, i0 + 2],
                vals[:, 11 + i0 // 3], vals[:, 10], vals[:, 6 + i0 // 3]],
                axis=-1)
            subset = _blend_cols(subset, col, new6, row_has)
        used = jnp.minimum(used + row_has, 1.0)

    # --- score, filter, selection sort (iterative masked argmax) ----------
    svals = jnp.stack([subset[:, 6 * j + cfg.sort_dim] for j in range(J)],
                      axis=1)                              # (M, J)
    pos = (svals > 0) & (used[:, None] > 0.5)
    npos = pos.sum(axis=1)
    score = jnp.where(npos > 0,
                      (svals * pos).sum(axis=1) / jnp.maximum(npos, 1), 0.0)
    keep_rows = (used > 0.5) & (score >= cfg.person_thre)
    count = keep_rows.sum()
    sel_score = jnp.where(keep_rows, score, -1.0)

    MP = cfg.max_poses
    subset_clean = jnp.where(jnp.equal(subset, -1.0), 0.0, subset)

    remaining = sel_score
    rows = []
    out_scores = []
    for i in range(MP):
        m = jnp.argmax(remaining).astype(jnp.int32)
        val = jnp.max(remaining)
        ok = (val >= cfg.person_thre).astype(jnp.float32)
        ohm = (arM == m).astype(jnp.float32)               # (M,)
        row = (ohm[:, None] * subset_clean).sum(axis=0)    # (J*6,)
        rows.append(row * ok)
        out_scores.append(val * ok)
        remaining = jnp.where(arM == m, -2.0, remaining)
    poses_out = jnp.stack(rows)                            # (MP, J*6)
    scores_out = jnp.stack(out_scores)
    return poses_out, scores_out, count.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('skeleton', 'cfg', 'n_keypoints',
                                             'capacity'))
def group_skeletons_xla_core(packed_limbs, skeleton, cfg: DecoderConfig,
                             n_keypoints: int = 17, capacity: int = 64):
    """The kernel-safe core under plain vmap/jit (for parity testing)."""
    J = n_keypoints

    def one(p):
        poses, scores, count = _group_core(
            p, tuple(map(tuple, skeleton)), cfg, J, capacity)
        return poses.reshape(cfg.max_poses, J, 6), scores, count

    return jax.vmap(one)(packed_limbs)


def group_skeletons_pallas(packed_limbs, skeleton, cfg: DecoderConfig,
                           n_keypoints: int = 17, capacity: int = 64,
                           interpret: bool = False):
    """Batched grouping as one Pallas program per image.

    Same signature/results as grouping.group_skeletons.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    skeleton = tuple(map(tuple, skeleton))
    n, L, K, C = packed_limbs.shape
    MP, J = cfg.max_poses, n_keypoints

    def kernel(limbs_ref, poses_ref, scores_ref, count_ref):
        packed = limbs_ref[0]
        poses, scores, count = _group_core(packed, skeleton, cfg, J, capacity)
        poses_ref[0] = poses
        scores_ref[0, 0] = scores
        count_ref[0, 0, 0] = count

    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, L, K, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, MP, J * 6), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, MP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, MP, J * 6), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, MP), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(packed_limbs.astype(jnp.float32))
    poses, scores, counts = out
    return (poses.reshape(n, MP, J, 6), scores[:, 0], counts[:, 0, 0])
