"""Greedy skeleton grouping as a single Pallas TPU kernel.

The XLA formulation (ops/grouping.py) is correct but costs ~10ms/batch: the 19
sequential limb iterations emit hundreds of microscopic HLOs, each paying
kernel-dispatch overhead. Here the whole grouping -- all limb iterations,
merging and the final selection sort -- runs as ONE Pallas program per image
(grid over the batch), with every data-dependent update expressed through
Mosaic-friendly 2D dataflow:

- the skeleton state lives in a flat (M, J*6) matrix; per-joint updates are
  column-mask blends (iota comparisons against the traced joint id),
- candidate row gathers, column selections/reorders and skeleton merges are
  one-hot/selection matmuls (Mosaic rejects lane concatenation of
  single-column slices),
- axis-0 (sublane) reductions run as 8-row iota-ones MXU contractions
  (`_sum_axis0`; Mosaic rejects implicit-dim sublane multi_reductions and
  literal-constant matmul operands),
- free-slot allocation is a rank-matching matrix between free rows and new
  connections (cumsum via triangular masked sums),
- tie-breaking is EXPLICIT first-index-wins (`_first_true_*` cumsum masks);
  Mosaic's argmax resolves ties differently from CPU XLA, which silently
  broke pose-ordering parity,
- no scatter/gather/argsort primitives, no dynamic_slice on values, no
  boolean rank-changing reshapes (all unsupported by the Mosaic lowering).

The kernel iterates limbs through its GRID -- grid (image, limb) with the
skeleton state in VMEM scratch persisting across the sequential steps and the
final selection sort under `pl.when` on the last limb -- so the Mosaic
program contains ONE limb body instead of 19 unrolled copies: cold compile
dropped from ~10-15 min to ~2 min at the default config (fori_loop over
limbs inside the kernel crashes Mosaic layout inference; the grid formulation
avoids in-kernel loop regions entirely).

`_group_core` is the same dataflow under jit/vmap (parity testing); it
implements the algorithm of grouping._group_single (same tie-breaking; see
grouping_ref.py for the spec) with one further alignment: a merge target row
absorbs at most one mergee per limb iteration (additional pairs settle on
later iterations).
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


def _first_true_cols(mask):
    """(R, C) bool -> 0/1 f32 with at most one 1 per row: the FIRST true
    column. Explicit tie-breaking -- Mosaic's argmax picks a different index
    among ties than CPU XLA, and the reference semantics are first-wins."""
    r, c = mask.shape
    triu = (_iota(c)[:, None] <= _iota(c)[None, :]).astype(jnp.float32)
    csum = mask.astype(jnp.float32) @ triu            # inclusive cumsum, axis 1
    return (mask & (csum == 1.0)).astype(jnp.float32)


def _first_true_rows(mask):
    """(R, C) bool -> 0/1 f32 with at most one 1 per column: FIRST true row."""
    r, c = mask.shape
    tril = (_iota(r)[:, None] >= _iota(r)[None, :]).astype(jnp.float32)
    csum = tril @ mask.astype(jnp.float32)            # inclusive cumsum, axis 0
    return (mask & (csum == 1.0)).astype(jnp.float32)


def _row_to_col(v):
    """(1, M) -> (M, 1) via an eye-masked axis-1 sum (Mosaic-safe: no
    transpose, no implicit-dim reshape of computed vectors)."""
    m = v.shape[1]
    eye = (_iota(m)[:, None] == _iota(m)[None, :]).astype(v.dtype)
    return (eye * v).sum(axis=1, keepdims=True)


def _sum_axis0(x):
    """Axis-0 (sublane) sum -> (1, C) via an 8-row MXU contraction.

    Mosaic rejects sublane `multi_reduction`s here ("unsupported output
    implicit dimension", keepdims or not); an iota-derived 8-row ones matrix
    (constants fold to literal operands, also rejected) contracting x is
    equivalent and MXU-native."""
    r = x.shape[0]
    ones8 = (jax.lax.broadcasted_iota(jnp.int32, (8, r), 0) >= 0).astype(
        x.dtype)
    return (ones8 @ x)[0:1]


def _col_of(subset, c):
    """subset[:, c] for a (possibly traced) scalar column index c."""
    mask = (_iota(subset.shape[1]) == c).astype(jnp.float32)
    return (subset * mask[None, :]).sum(axis=1)


def _set_col(subset, c, newv, gate):
    """subset with column c replaced by newv where gate (all traced-safe)."""
    mask = (_iota(subset.shape[1]) == c).astype(jnp.float32) * gate[:, None]
    return subset * (1.0 - mask) + newv[:, None] * mask


def _sel_matrix(rows, tcols):
    """(rows, len(tcols)) f32 selection matrix: S[r, c] = (r == tcols[c]).

    Built from rank-2 iotas (static tcols), so `x @ S` selects/reorders
    columns of x -- Mosaic rejects concatenation of single-column slices
    with mismatched lane offsets, but handles the matmul fine."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, len(tcols)), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, len(tcols)), 1)
    out = jnp.zeros((rows, len(tcols)), jnp.float32)
    for ci, t in enumerate(tcols):
        out = out + ((r == t) & (c == ci)).astype(jnp.float32)
    return out


def _blend_cols(subset, j, new6, gate):
    """subset (M, J*6) with columns [6j, 6j+6) replaced by new6 where gate.

    gate: (M,) float32 in {0, 1}; j may be a traced joint index. new6 is
    (M, 6); it is tiled across all joints (via a 0/1 matmul -- no lane
    concatenation) and masked to joint j's columns."""
    J6 = subset.shape[1]
    q = jax.lax.broadcasted_iota(jnp.int32, (6, J6), 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (6, J6), 0)
    tile_mat = (q % 6 == r).astype(jnp.float32)           # (6, J*6)
    tiled = new6 @ tile_mat                               # (M, J*6)
    colmask = (_iota(J6) // 6 == j).astype(jnp.float32)
    g = colmask[None, :] * gate[:, None]
    return subset * (1.0 - g) + tiled * g


def _limb_update(subset, used, conns, jf, jt, cfg: DecoderConfig):
    """One limb type's greedy update. jf/jt may be traced scalars."""
    # the limb collector emits +/-inf sentinels (off-image push, invalid
    # distances); this dataflow gathers rows via one-hot MATMULS, where
    # 0 * inf = NaN would poison entire skeletons. Clamping to +/-1e9
    # preserves every comparison against finite thresholds exactly.
    conns = jnp.clip(conns, -1e9, 1e9)
    # HIGHEST precision is required: the one-hot matmul gathers carry raw
    # keypoint flat indices (up to ~2.6M for 640^2 x4 upsampled maps), and the
    # TPU's default bf16x3 dot rounds them (~0.25 absolute at 2M), breaking
    # the joint-identity equality tests -> total skeleton fragmentation.
    # CPU XLA dots are exact f32, which is why only compiled-TPU runs broke.
    with jax.default_matmul_precision('highest'):
        return _limb_update_body(subset, used, conns, jf, jt, cfg)


def _limb_update_body(subset, used, conns, jf, jt, cfg: DecoderConfig):
    K = conns.shape[0]
    M = subset.shape[0]
    arK = _iota(K)
    arM = _iota(M)

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

    jid_f = _col_of(subset, 6 * jf + COL_IND)
    jid_t = _col_of(subset, 6 * jt + COL_IND)
    row_gate = (used[:, None] > 0.5) & keep[None, :]
    m1 = (jid_f[:, None] == ind1[None, :]) & row_gate
    m2 = (jid_t[:, None] == ind2[None, :]) & row_gate
    mask_sum = m1.astype(jnp.int32) + m2.astype(jnp.int32)
    sub_sc_f = _col_of(subset, 6 * jf + COL_LSC)
    sub_sc_t = _col_of(subset, 6 * jt + COL_LSC)
    replace = (score[None, :] > sub_sc_t[:, None]) | (
        score[None, :] > sub_sc_f[:, None])

    # --- redundant limb inside one skeleton --------------------------------
    upd2 = (mask_sum == 2) & replace
    best2 = jnp.max(jnp.where(upd2, score[None, :], -jnp.inf), axis=1)
    have2 = upd2.any(axis=1).astype(jnp.float32)
    for col_sc, old in ((6 * jf + COL_LSC, sub_sc_f),
                        (6 * jt + COL_LSC, sub_sc_t)):
        newv = jnp.maximum(old, best2) * have2 + old * (1.0 - have2)
        subset = _set_col(subset, col_sc, newv,
                          jnp.ones((subset.shape[0],), jnp.float32))

    # --- extend skeletons sharing one joint --------------------------------
    cand = (mask_sum == 1) & replace
    have1 = cand.any(axis=1).astype(jnp.float32)
    masked = jnp.where(cand, score[None, :], -jnp.inf)
    rowmax = jnp.max(masked, axis=1)
    oh1 = _first_true_cols(masked == rowmax[:, None])  # (M, K) best-k, 1st wins
    g = oh1 @ conns                                   # (M, 13)
    sel_score = g[:, 10]
    lsc_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, 6), 1)
                == COL_LSC).astype(jnp.float32)
    for col, i0 in ((jf, 0), (jt, 3)):
        old_lsc = _col_of(subset, 6 * col + COL_LSC)
        new6 = g @ _sel_matrix(
            13, (i0, i0 + 1, i0 + 2, 11 + i0 // 3, 10, 6 + i0 // 3))
        # the COL_LSC column carries max(old, sel_score), not sel_score
        lsc = jnp.maximum(old_lsc, sel_score)
        new6 = new6 * (1.0 - lsc_mask) + lsc[:, None] * lsc_mask
        subset = _blend_cols(subset, col, new6, have1)

    # --- merge pairs sharing exactly two keypoint inds ---------------------
    J = subset.shape[1] // 6
    inds = subset @ _sel_matrix(
        subset.shape[1], tuple(6 * j + COL_IND for j in range(J)))  # (M, J)
    shared = ((inds[:, None, :] == inds[None, :, :])
              & (inds[:, None, :] != -1.0)).sum(axis=-1)
    upper = arM[:, None] < arM[None, :]
    mergeable = ((shared == 2) & upper
                 & (used[:, None] > 0.5) & (used[None, :] > 0.5))
    ht_row = _sum_axis0(mergeable.astype(jnp.float32)) > 0     # (1, Mb)
    FT = _first_true_rows(mergeable)                   # (Ma, Mb): first a per b
    # has_target gathered at a_sel (= the FT row), via a masked axis-0 sum
    tim = _sum_axis0(FT * _row_to_col(
        ht_row.astype(jnp.float32))) > 0               # (1, Mb)
    do_merge = ht_row & ~tim                           # (1, Mb) mergee rows
    T = FT * do_merge.astype(jnp.float32)              # (Ma, Mb)
    # one mergee per target row per iteration (extra pairs settle later)
    hasb = (T.sum(axis=1) > 0).astype(jnp.float32)     # (Ma,)
    T1 = _first_true_cols(T > 0)                       # (Ma, Mb) 0/1
    consumed = _sum_axis0(T1)                          # (1, Mb) 0/1
    contrib = T1 @ subset                              # (M, J*6)
    merged = jnp.maximum(subset, contrib)
    gm = hasb[:, None]
    subset = merged * gm + subset * (1.0 - gm)
    cm = _row_to_col(consumed)                         # (M, 1)
    subset = subset * (1.0 - cm) + (-1.0) * cm
    used = used * (1.0 - cm[:, 0])

    # --- new skeletons from unmatched conns --------------------------------
    untouched_row = _sum_axis0(
        (mask_sum == 0).astype(jnp.float32)) == float(M)   # (1, K)
    new_k = (keep[None, :] & untouched_row).astype(jnp.float32)[0]
    new_rank = _cumsum_incl(new_k) - 1.0               # (K,)
    free = 1.0 - used
    r_free = _cumsum_incl(free) - 1.0                  # (M,)
    assign = (free[:, None] * new_k[None, :]) * (
        r_free[:, None] == new_rank[None, :]).astype(jnp.float32)
    row_has = jnp.minimum(assign.sum(axis=1), 1.0)     # (M,) 0/1
    vals = assign @ conns                              # (M, 13)
    for col, i0 in ((jf, 0), (jt, 3)):
        new6 = vals @ _sel_matrix(
            13, (i0, i0 + 1, i0 + 2, 11 + i0 // 3, 10, 6 + i0 // 3))
        subset = _blend_cols(subset, col, new6, row_has)
    used = jnp.minimum(used + row_has, 1.0)
    return subset, used


def _finalize(subset, used, cfg: DecoderConfig, J: int):
    """Score, filter and selection-sort the final skeleton state
    (iterative masked argmax; statically unrolled -- MP blocks of ~6 ops).
    HIGHEST matmul precision: see _limb_update."""
    with jax.default_matmul_precision('highest'):
        return _finalize_body(subset, used, cfg, J)


def _finalize_body(subset, used, cfg: DecoderConfig, J: int):
    svals = subset @ _sel_matrix(
        subset.shape[1], tuple(6 * j + cfg.sort_dim for j in range(J)))
    pos = (svals > 0) & (used[:, None] > 0.5)
    npos = pos.sum(axis=1)
    score = jnp.where(npos > 0,
                      (svals * pos).sum(axis=1) / jnp.maximum(npos, 1), 0.0)
    keep_rows = (used > 0.5) & (score >= cfg.person_thre)
    count = keep_rows.sum()
    sel_score = jnp.where(keep_rows, score, -1.0)

    MP = cfg.max_poses
    subset_clean = jnp.where(jnp.equal(subset, -1.0), 0.0, subset)

    remaining = sel_score                                  # (M,)
    rows = []
    out_scores = []
    for i in range(MP):
        val = jnp.max(remaining)
        ok = (val >= cfg.person_thre).astype(jnp.float32)
        eq = remaining == val
        csum = _cumsum_incl(eq.astype(jnp.float32))
        ohm = (eq & (csum == 1.0)).astype(jnp.float32)     # (M,) first max
        row = _sum_axis0(ohm[:, None] * subset_clean)
        rows.append(row * ok)                              # (1, J*6)
        out_scores.append(val * ok)
        remaining = jnp.where(ohm > 0, -2.0, remaining)
    poses_out = jnp.concatenate(rows, axis=0)              # (MP, J*6)
    scores_out = jnp.stack(out_scores)
    return poses_out, scores_out, count.astype(jnp.int32)


def _group_core(load_conns, load_joints, L, cfg: DecoderConfig, J: int,
                M: int):
    """One image's (L, K, 13) candidate limbs -> (poses (MP, J*6), scores,
    count). Pure 2D dataflow (used by the XLA/vmap parity path; the Pallas
    kernel iterates limbs through its grid instead)."""
    subset = jnp.full((M, J * 6), -1.0, dtype=jnp.float32)
    used = jnp.zeros((M,), dtype=jnp.float32)       # 1.0 = occupied

    def limb_body(l, carry):
        subset, used = carry
        conns = load_conns(l).astype(jnp.float32)
        jf, jt = load_joints(l)
        return _limb_update(subset, used, conns, jf, jt, cfg)

    subset, used = jax.lax.fori_loop(0, L, limb_body, (subset, used))
    return _finalize(subset, used, cfg, J)


@functools.partial(jax.jit, static_argnames=('skeleton', 'cfg', 'n_keypoints',
                                             'capacity'))
def group_skeletons_xla_core(packed_limbs, skeleton, cfg: DecoderConfig,
                             n_keypoints: int = 17, capacity: int = 64):
    """The kernel-safe core under plain vmap/jit (for parity testing)."""
    J = n_keypoints

    skel = jnp.asarray(tuple(map(tuple, skeleton)), dtype=jnp.int32)
    L, K, C = packed_limbs.shape[1:]

    def one(p):
        load = lambda l: jax.lax.dynamic_slice(p, (l, 0, 0), (1, K, C))[0]
        joints = lambda l: (jax.lax.dynamic_index_in_dim(skel[:, 0], l, 0,
                                                         keepdims=False),
                            jax.lax.dynamic_index_in_dim(skel[:, 1], l, 0,
                                                         keepdims=False))
        poses, scores, count = _group_core(load, joints, L, cfg, J, capacity)
        return poses.reshape(cfg.max_poses, J, 6), scores, count

    return jax.vmap(one, in_axes=(0,))(packed_limbs)


def group_skeletons_pallas(packed_limbs, skeleton, cfg: DecoderConfig,
                           n_keypoints: int = 17, capacity: int = 64,
                           interpret: bool = False):
    """Batched grouping as one Pallas program, grid = (image, limb).

    The kernel body contains ONE limb update (joint ids read from SMEM by
    `program_id(1)`); the skeleton state lives in VMEM scratch that persists
    across the sequential grid steps, and the final selection sort runs under
    `pl.when` on the last limb step. This keeps the Mosaic program ~L times
    smaller than a statically unrolled kernel (cold compile: minutes -> tens
    of seconds) with zero extra dispatches or HBM round-trips.

    Same signature/results as grouping.group_skeletons.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    skeleton = tuple(map(tuple, skeleton))
    n, L, K, C = packed_limbs.shape
    MP, J = cfg.max_poses, n_keypoints
    M = capacity

    def kernel(limbs_ref, jf_ref, jt_ref, poses_ref, scores_ref, count_ref,
               subset_s, used_s):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _init():
            subset_s[...] = jnp.full((M, J * 6), -1.0, jnp.float32)
            used_s[...] = jnp.zeros((M, 1), jnp.float32)

        conns = limbs_ref[0, 0].astype(jnp.float32)        # (K, C)
        subset, used = _limb_update(subset_s[...], used_s[...][:, 0],
                                    conns, jf_ref[l], jt_ref[l], cfg)
        subset_s[...] = subset
        used_s[...] = used[:, None]

        @pl.when(l == L - 1)
        def _flush():
            poses, scores, count = _finalize(subset, used, cfg, J)
            poses_ref[0] = poses
            scores_ref[0, 0] = scores
            count_ref[0, 0, 0] = count

    skel_arr = jnp.asarray(skeleton, dtype=jnp.int32)      # (L, 2)
    out = pl.pallas_call(
        kernel,
        grid=(n, L),
        in_specs=[pl.BlockSpec((1, 1, K, C), lambda i, l: (i, l, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L,), lambda i, l: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((L,), lambda i, l: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, MP, J * 6), lambda i, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, MP), lambda i, l: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, l: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, MP, J * 6), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, MP), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((M, J * 6), jnp.float32),
                        pltpu.VMEM((M, 1), jnp.float32)],
        interpret=interpret,
    )(packed_limbs.astype(jnp.float32),
      skel_arr[:, 0] + 0, skel_arr[:, 1] + 0)
    poses, scores, counts = out
    return (poses.reshape(n, MP, J, 6), scores[:, 0], counts[:, 0, 0])
