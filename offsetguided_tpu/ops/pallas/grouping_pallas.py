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


def _cumsum_incl(v, seg: int = 0):
    """Inclusive cumsum via a triangular masked sum (no matrix-vector dots).

    seg > 0 restarts the cumsum every `seg` elements (per-image segments in
    the row-batched kernel)."""
    n = v.shape[0]
    tril = _iota(n)[:, None] >= _iota(n)[None, :]
    if seg:
        tril = tril & (_iota(n)[:, None] // seg == _iota(n)[None, :] // seg)
    return (tril.astype(v.dtype) * v[None, :]).sum(axis=1)


def _first_true_cols(mask):
    """(R, C) bool -> 0/1 f32 with at most one 1 per row: the FIRST true
    column. Explicit tie-breaking -- Mosaic's argmax picks a different index
    among ties than CPU XLA, and the reference semantics are first-wins."""
    r, c = mask.shape
    triu = (_iota(c)[:, None] <= _iota(c)[None, :]).astype(jnp.float32)
    # 0/1 operands are exact in bf16 and the MXU accumulates in f32, so this
    # (R,C)@(C,C) -- the biggest matmul in the kernel -- can run at DEFAULT
    # precision even inside the 'highest' value-gather context
    csum = jnp.matmul(mask.astype(jnp.float32), triu,
                      precision=jax.lax.Precision.DEFAULT)
    return (mask & (csum == 1.0)).astype(jnp.float32)


def _first_true_rows(mask):
    """(R, C) bool -> 0/1 f32 with at most one 1 per column: FIRST true row."""
    r, c = mask.shape
    tril = (_iota(r)[:, None] >= _iota(r)[None, :]).astype(jnp.float32)
    # mask-only matmul: DEFAULT precision is exact (see _first_true_cols)
    csum = jnp.matmul(tril, mask.astype(jnp.float32),
                      precision=jax.lax.Precision.DEFAULT)
    return (mask & (csum == 1.0)).astype(jnp.float32)


def _row_to_col(v):
    """(1, M) -> (M, 1) via an eye-masked axis-1 sum (Mosaic-safe: no
    transpose, no implicit-dim reshape of computed vectors)."""
    m = v.shape[1]
    eye = (_iota(m)[:, None] == _iota(m)[None, :]).astype(v.dtype)
    return (eye * v).sum(axis=1, keepdims=True)


def _sum_axis0(x, exact_values: bool = False):
    """Axis-0 (sublane) sum -> (1, C) via an 8-row MXU contraction.

    Mosaic rejects sublane `multi_reduction`s here ("unsupported output
    implicit dimension", keepdims or not); an iota-derived 8-row ones matrix
    (constants fold to literal operands, also rejected) contracting x is
    equivalent and MXU-native.

    Most call sites contract 0/1 masks, which are exact in bf16, so the
    contraction runs at DEFAULT precision (one MXU pass) even inside the
    kernel's 'highest' (six-pass) context; pass exact_values=True when x
    carries raw keypoint indices/values that exceed bf16x3's 16 mantissa
    bits (see _limb_update)."""
    r = x.shape[0]
    ones8 = (jax.lax.broadcasted_iota(jnp.int32, (8, r), 0) >= 0).astype(
        x.dtype)
    prec = (jax.lax.Precision.HIGHEST if exact_values
            else jax.lax.Precision.DEFAULT)
    return jnp.matmul(ones8, x, precision=prec)[0:1]


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


def _limb_update(subset, used, conns, jf, jt, cfg: DecoderConfig,
                 n_img: int = 1):
    """One limb type's greedy update. jf/jt may be traced scalars.

    With n_img > 1, `subset`/`used` hold n_img images' states stacked on the
    row axis (n_img * M rows) and `conns` the stacked candidates
    (n_img * K rows); image-locality masks keep every interaction
    block-diagonal, so one call advances ALL images of the batch group -- the
    kernel's grid shrinks from (n, L) sequential steps to (ceil(n/G), L).
    """
    # the limb collector emits +/-inf sentinels (off-image push, invalid
    # distances), and flip-test merging can average opposing sentinels into
    # NaN. The validity gate must use the RAW values so NaN/inf compare
    # exactly like the XLA grouping (IEEE: any NaN comparison is false);
    # elementwise ops handle non-finite values fine.
    x1r, y1r, x2r, y2r = conns[:, 0], conns[:, 1], conns[:, 3], conns[:, 4]
    deltar, scale2r = conns[:, 8], conns[:, 12]
    if cfg.use_scale:
        dist_valid = deltar < jnp.maximum(cfg.dist_max, scale2r)
    else:
        dist_valid = deltar < cfg.dist_max
    valid = dist_valid & (x1r > 0) & (y1r > 0) & (x2r > 0) & (y2r > 0)
    # ... but the dataflow gathers rows via one-hot MATMULS, where 0 * inf
    # and 0 * NaN poison entire skeletons -- sanitize the values before any
    # dot. Every surviving comparison is against finite thresholds on valid
    # (finite) rows, so the clamp changes nothing there.
    conns = jnp.where(conns != conns, jnp.float32(-1e9),
                      jnp.clip(conns, -1e9, 1e9))
    # HIGHEST precision is required: the one-hot matmul gathers carry raw
    # keypoint flat indices (up to ~2.6M for 640^2 x4 upsampled maps), and the
    # TPU's default bf16x3 dot rounds them (~0.25 absolute at 2M), breaking
    # the joint-identity equality tests -> total skeleton fragmentation.
    # CPU XLA dots are exact f32, which is why only compiled-TPU runs broke.
    with jax.default_matmul_precision('highest'):
        return _limb_update_body(subset, used, conns, valid, jf, jt, cfg,
                                 n_img)


def _limb_update_body(subset, used, conns, valid, jf, jt,
                      cfg: DecoderConfig, n_img: int = 1):
    K = conns.shape[0] // n_img          # per-image candidate count
    M = subset.shape[0] // n_img         # per-image skeleton capacity
    BK, BM = conns.shape[0], subset.shape[0]
    arK = _iota(BK)
    arM = _iota(BM)
    # image-locality masks (all-true when n_img == 1; skipped statically)
    if n_img > 1:
        ci = arK // K                    # image id per candidate row
        ri = arM // M                    # image id per skeleton row
        ci_eq = ci[:, None] == ci[None, :]
        ri_eq = ri[:, None] == ri[None, :]
        ri_ci = ri[:, None] == ci[None, :]

    ind1, ind2 = conns[:, 6], conns[:, 7]
    score = conns[:, 10]

    same = ind2[:, None] == ind2[None, :]
    if n_img > 1:
        same = same & ci_eq            # inds may collide across images
    better = (score[None, :] > score[:, None]) | (
        (score[None, :] == score[:, None]) & (arK[None, :] < arK[:, None]))
    keep = valid & ~(valid[None, :] & same & better).any(axis=1)

    jid_f = _col_of(subset, 6 * jf + COL_IND)
    jid_t = _col_of(subset, 6 * jt + COL_IND)
    row_gate = (used[:, None] > 0.5) & keep[None, :]
    if n_img > 1:
        row_gate = row_gate & ri_ci
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
    subset, used = _merge_pass_2d(subset, used, n_img)

    # --- new skeletons from unmatched conns --------------------------------
    # cross-image m1/m2 entries are masked to 0, so an all-rows test is
    # equivalent to an all-rows-of-its-image test
    untouched_row = _sum_axis0(
        (mask_sum == 0).astype(jnp.float32)) == float(BM)  # (1, BK)
    new_k = (keep[None, :] & untouched_row).astype(jnp.float32)[0]
    # free-slot ranking restarts per image (segmented cumsums)
    new_rank = _cumsum_incl(new_k, K if n_img > 1 else 0) - 1.0   # (BK,)
    free = 1.0 - used
    r_free = _cumsum_incl(free, M if n_img > 1 else 0) - 1.0      # (BM,)
    assign = (free[:, None] * new_k[None, :]) * (
        r_free[:, None] == new_rank[None, :]).astype(jnp.float32)
    if n_img > 1:
        assign = assign * ri_ci.astype(jnp.float32)
    row_has = jnp.minimum(assign.sum(axis=1), 1.0)     # (M,) 0/1
    vals = assign @ conns                              # (M, 13)
    for col, i0 in ((jf, 0), (jt, 3)):
        new6 = vals @ _sel_matrix(
            13, (i0, i0 + 1, i0 + 2, 11 + i0 // 3, 10, 6 + i0 // 3))
        subset = _blend_cols(subset, col, new6, row_has)
    used = jnp.minimum(used + row_has, 1.0)
    return subset, used


def _merge_pass_2d(subset, used, n_img: int = 1):
    """One merge iteration in flat-(M, J*6) dataflow (Mosaic-safe): rows
    sharing exactly two keypoint inds fold into the first matching target;
    one mergee per target per pass (chains settle on subsequent passes)."""
    BM = subset.shape[0]
    M = BM // n_img
    arM = _iota(BM)
    J = subset.shape[1] // 6
    inds = subset @ _sel_matrix(
        subset.shape[1], tuple(6 * j + COL_IND for j in range(J)))  # (M, J)
    # accumulate per joint: the rank-3 (BM, BM, J) broadcast form costs
    # BM^2*J*4 bytes of VMEM (17 MB at BM=512), the J-unrolled form BM^2
    shared = jnp.zeros((BM, BM), jnp.int32)
    for j in range(J):
        cj = _col_of(inds, j)                              # (BM,)
        eqj = (cj[:, None] == cj[None, :]) & (cj[:, None] != -1.0)
        shared = shared + eqj.astype(jnp.int32)
    upper = arM[:, None] < arM[None, :]
    mergeable = ((shared == 2) & upper
                 & (used[:, None] > 0.5) & (used[None, :] > 0.5))
    if n_img > 1:
        ri = arM // M
        mergeable = mergeable & (ri[:, None] == ri[None, :])
    ht_row = _sum_axis0(mergeable.astype(jnp.float32)) > 0     # (1, Mb)
    FT = _first_true_rows(mergeable)                   # (Ma, Mb): first a per b
    # has_target gathered at a_sel (= the FT row), via a masked axis-0 sum
    tim = _sum_axis0(FT * _row_to_col(
        ht_row.astype(jnp.float32))) > 0               # (1, Mb)
    do_merge = ht_row & ~tim                           # (1, Mb) mergee rows
    T = FT * do_merge.astype(jnp.float32)              # (Ma, Mb)
    # one mergee per target row per pass (extra pairs settle later)
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
        row = _sum_axis0(ohm[:, None] * subset_clean, exact_values=True)
        rows.append(row * ok)                              # (1, J*6)
        out_scores.append(val * ok)
        remaining = jnp.where(ohm > 0, -2.0, remaining)
    poses_out = jnp.concatenate(rows, axis=0)              # (MP, J*6)
    scores_out = jnp.stack(out_scores)
    return poses_out, scores_out, count.astype(jnp.int32)


def _finalize_batched(subset, used, cfg: DecoderConfig, J: int, n_img: int,
                      M: int):
    """Row-batched _finalize: n_img images' states stacked on the row axis.

    Per-image selection sort runs for ALL images simultaneously -- each of the
    MP iterations extracts one row per image (a (n_img, BM) masked max + a
    segmented first-true). Returns (poses (MP*n_img, J*6) mp-major,
    counts (n_img, 1) f32); per-pose scores are recomputed by the host from
    the emitted rows (same masked-mean formula), keeping the kernel's store
    shapes 2D."""
    with jax.default_matmul_precision('highest'):
        BM = n_img * M
        svals = subset @ _sel_matrix(
            subset.shape[1], tuple(6 * j + cfg.sort_dim for j in range(J)))
        pos = (svals > 0) & (used[:, None] > 0.5)
        npos = pos.sum(axis=1)
        score = jnp.where(npos > 0,
                          (svals * pos).sum(axis=1) / jnp.maximum(npos, 1),
                          0.0)
        keep_rows = (used > 0.5) & (score >= cfg.person_thre)
        sel_score = jnp.where(keep_rows, score, -1.0)
        subset_clean = jnp.where(jnp.equal(subset, -1.0), 0.0, subset)

        # (n_img, BM) 0/1: row r belongs to image b; and its (BM, n_img) mate
        bi = jax.lax.broadcasted_iota(jnp.int32, (n_img, BM), 0)
        rr = jax.lax.broadcasted_iota(jnp.int32, (n_img, BM), 1)
        imgmask = (rr // M == bi).astype(jnp.float32)       # (n_img, BM)
        rb = jax.lax.broadcasted_iota(jnp.int32, (BM, n_img), 0)
        bb = jax.lax.broadcasted_iota(jnp.int32, (BM, n_img), 1)
        maskT = (rb // M == bb).astype(jnp.float32)         # (BM, n_img)

        counts = jnp.matmul(imgmask, keep_rows.astype(jnp.float32)[:, None],
                            precision=jax.lax.Precision.DEFAULT)   # (n_img,1)

        MP = cfg.max_poses
        remaining = sel_score                                # (BM,)
        rows = []
        for _ in range(MP):
            remB = imgmask * remaining[None, :] - (1.0 - imgmask) * 3.0
            valB = jnp.max(remB, axis=1, keepdims=True)      # (n_img, 1)
            okB = (valB >= cfg.person_thre).astype(jnp.float32)
            rowval = (maskT @ valB)[:, 0]                    # (BM,)
            eq = remaining == rowval
            csum = _cumsum_incl(eq.astype(jnp.float32), M)   # per-image
            ohm = (eq & (csum == 1.0)).astype(jnp.float32)   # <=1 per image
            emit = ohm * (maskT @ okB)[:, 0]                 # (BM,)
            rows.append(imgmask @ (emit[:, None] * subset_clean))  # (n_img,J6)
            remaining = jnp.where(ohm > 0, -2.0, remaining)
        poses_out = jnp.concatenate(rows, axis=0)   # (MP*n_img, J*6) mp-major
        return poses_out, counts


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
    # settle leftover merge chains (HIGHEST precision: index-carrying matmuls,
    # see _limb_update)
    with jax.default_matmul_precision('highest'):
        for _ in range(cfg.settle_passes):
            subset, used = _merge_pass_2d(subset, used)
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
                           interpret: bool = False, group_size: int = 1):
    """Batched grouping as one Pallas program, grid = (group, limb).

    `group_size` images are stacked on the ROW axis of the kernel state
    (image-locality masks keep every interaction block-diagonal, see
    _limb_update), shrinking the grid from (n, L) to (ceil(n/G), L)
    sequential steps; the final per-image selection sorts also run batched
    (_finalize_batched) and per-pose scores are recomputed on the host with
    the identical masked-mean formula.

    Measured on v5e (batch 8, topk 32, capacity 64, trace-based op timing):
    G=1 2.72 ms, G=4 3.58 ms, G=8 4.63 ms -- the (G*M)^2 pairwise-state ops
    (merge detection, dedup, first-true cumsums) grow faster than the step
    count shrinks, so the per-image grid is the default; group_size stays for
    configurations with smaller capacity/top-k where the trade flips.

    Same signature/results as grouping.group_skeletons.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    skeleton = tuple(map(tuple, skeleton))
    n, L, K, C = packed_limbs.shape
    MP, J = cfg.max_poses, n_keypoints
    M = capacity
    G = max(1, min(n, group_size))
    ngroups = -(-n // G)
    BM = G * M

    x = packed_limbs.astype(jnp.float32)
    npad = ngroups * G - n
    if npad:
        # all-zero candidates: x1 > 0 fails -> padded images decode to 0 poses
        x = jnp.concatenate(
            [x, jnp.zeros((npad, L, K, C), jnp.float32)], axis=0)
    # (ngroups, L, G*K, C): one grid step loads a whole group's candidates
    x = x.reshape(ngroups, G, L, K, C).transpose(0, 2, 1, 3, 4)
    x = x.reshape(ngroups, L, G * K, C)

    S = cfg.settle_passes              # extra merge-only grid steps
    LS = L + S

    def kernel(limbs_ref, jf_ref, jt_ref, poses_ref, counts_ref,
               subset_s, used_s):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _init():
            subset_s[...] = jnp.full((BM, J * 6), -1.0, jnp.float32)
            used_s[...] = jnp.zeros((BM, 1), jnp.float32)

        @pl.when(l < L)
        def _limb():
            conns = limbs_ref[0, 0].astype(jnp.float32)    # (G*K, C)
            li = jnp.minimum(l, L - 1)
            subset, used = _limb_update(subset_s[...], used_s[...][:, 0],
                                        conns, jf_ref[li], jt_ref[li], cfg,
                                        n_img=G)
            subset_s[...] = subset
            used_s[...] = used[:, None]

        @pl.when(l >= L)
        def _settle():
            # settle leftover merge chains (index-carrying matmuls: HIGHEST)
            with jax.default_matmul_precision('highest'):
                subset, used = _merge_pass_2d(subset_s[...],
                                              used_s[...][:, 0], n_img=G)
            subset_s[...] = subset
            used_s[...] = used[:, None]

        @pl.when(l == LS - 1)
        def _flush():
            poses, counts = _finalize_batched(subset_s[...],
                                              used_s[...][:, 0], cfg, J, G, M)
            poses_ref[0] = poses                           # (MP*G, J*6)
            counts_ref[0] = counts                         # (G, 1)

    skel_arr = jnp.asarray(skeleton, dtype=jnp.int32)      # (L, 2)
    out = pl.pallas_call(
        kernel,
        grid=(ngroups, LS),
        in_specs=[pl.BlockSpec((1, 1, G * K, C),
                               lambda g, l: (g, jnp.minimum(l, L - 1), 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L,), lambda g, l: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((L,), lambda g, l: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, MP * G, J * 6), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ngroups, MP * G, J * 6), jnp.float32),
            jax.ShapeDtypeStruct((ngroups, G, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((BM, J * 6), jnp.float32),
                        pltpu.VMEM((BM, 1), jnp.float32)],
        # the row-batched unrolled program's stack exceeds the compiler's
        # conservative 16MB scoped-vmem default; v5e VMEM is 128MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, skel_arr[:, 0] + 0, skel_arr[:, 1] + 0)
    poses_raw, counts_raw = out

    # (ngroups, MP*G, J*6) mp-major -> (n, MP, J, 6)
    poses = poses_raw.reshape(ngroups, MP, G, J, 6)
    poses = poses.transpose(0, 2, 1, 3, 4).reshape(ngroups * G, MP, J, 6)
    poses = poses[:n]
    counts = counts_raw.reshape(ngroups * G)[:n].astype(jnp.int32)
    # per-pose scores: masked mean of the sort column over positive keypoints
    # (identical to _finalize's formula; emitted rows have -1 cleaned to 0)
    svals = poses[..., cfg.sort_dim]                       # (n, MP, J)
    pos = svals > 0
    npos = pos.sum(axis=-1)
    scores = jnp.where(npos > 0,
                       (svals * pos).sum(axis=-1) / jnp.maximum(npos, 1),
                       0.0)
    return poses, scores, counts
