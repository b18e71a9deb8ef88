"""Fused peak finding: bicubic x4 upsample + 3x3 NMS + 2x2 block-max in one
Pallas kernel, phase-decomposed so the full-resolution heatmap NEVER exists.

The reference decodes peaks from the x4-bicubic-upsampled heatmap
(decoder/factory.py:74-88 + heatmap.py:15-49). Materializing that
(N, 4h, 4w, C) fp32 map costs ~223MB of HBM traffic per batch-8 at 640^2 and
three full passes (upsample write, NMS read/write, block-max read) -- ~7ms.

Key identity: with an even upsample factor, the 2x2 block decomposition of
the output aligns with the output-parity phases of the interpolation. Writing
U[2i+dy, 2j+dx] = (Ud_dy^T @ X @ Ud_dx) for the parity-split dense
interpolation matrices Ud (built from the same `_upsample_matrix` weights as
the XLA path, so values are identical), the whole chain becomes:

  - 6 small matmuls per channel (MXU),
  - 3x3 NMS = shifted elementwise maxes ACROSS the four parity planes
    (zero fill at borders, matching the reference's F.pad),
  - 2x2 block-max = elementwise max of the four NMS'd planes, and the
    within-block argmax (first-wins, row-major) falls out as a plane code.

Outputs (block values, block argmax code) at quarter resolution; the
downstream top-k then runs on 1/4 of the data and final coordinates are
ys = 2*by + code//2, xs = 2*bx + code%2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..resize import _upsample_matrix


@functools.lru_cache(maxsize=8)
def _parity_matrices(n: int, factor: int, method: str):
    """Even/odd-output-column splits of the (n, n*factor) upsample matrix."""
    U = _upsample_matrix(n, factor, method)       # (n, n*factor)
    return np.ascontiguousarray(U[:, 0::2]), np.ascontiguousarray(U[:, 1::2])


def _shift0(x, d):
    """Shift along axis 0 by d with zero fill (NMS border semantics)."""
    if d == 0:
        return x
    h = x.shape[0]
    if d > 0:   # value at i comes from i - d
        return jnp.pad(x, ((d, 0), (0, 0)))[:h]
    return jnp.pad(x, ((0, -d), (0, 0)))[-d:]


def _shift1(x, d):
    if d == 0:
        return x
    w = x.shape[1]
    if d > 0:
        return jnp.pad(x, ((0, 0), (d, 0)))[:, :w]
    return jnp.pad(x, ((0, 0), (0, -d)))[:, -d:]


def _peaks_core(x, ue, uo):
    """(h, w) map -> (bvals, bcode) at (h*f/2, w*f/2) block resolution."""
    # parity planes u[dy][dx] of the upsampled map (H first, then W --
    # same contraction order as upsample2d_matmul). HIGHEST precision to
    # match upsample2d_matmul: these matmuls carry raw heatmap values, and
    # Mosaic's DEFAULT f32 dot truncates inputs to bf16 (~0.04 oracle AP
    # on the hard benchmark).
    with jax.default_matmul_precision('highest'):
        p0 = ue.T @ x                              # (Hb, h)
        p1 = uo.T @ x
        u = [[p0 @ ue, p0 @ uo], [p1 @ ue, p1 @ uo]]   # (Hb, Wb) each

    # separable 3x3 neighborhood max. Row pass: for output row 2i+dy, the
    # y-neighbors live in the other parity plane at static shifts.
    g = [[None, None], [None, None]]
    for dy in (0, 1):
        for dx in (0, 1):
            same = u[dy][dx]
            if dy == 0:
                prev = _shift0(u[1][dx], 1)        # y-1 = 2(i-1)+1
                nxt = u[1][dx]                     # y+1 = 2i+1
            else:
                prev = u[0][dx]                    # y-1 = 2i
                nxt = _shift0(u[0][dx], -1)        # y+1 = 2(i+1)
            g[dy][dx] = jnp.maximum(jnp.maximum(prev, same), nxt)
    nms = [[None, None], [None, None]]
    for dy in (0, 1):
        for dx in (0, 1):
            same = g[dy][dx]
            if dx == 0:
                prev = _shift1(g[dy][1], 1)
                nxt = g[dy][1]
            else:
                prev = g[dy][0]
                nxt = _shift1(g[dy][0], -1)
            hmax = jnp.maximum(jnp.maximum(prev, same), nxt)
            nms[dy][dx] = jnp.where(u[dy][dx] == hmax, u[dy][dx], 0.0)

    # 2x2 block-max + first-wins (row-major) within-block code
    best = nms[0][0]
    code = jnp.zeros_like(best)
    for idx, plane in ((1.0, nms[0][1]), (2.0, nms[1][0]), (3.0, nms[1][1])):
        upd = plane > best
        code = jnp.where(upd, idx, code)
        best = jnp.where(upd, plane, best)
    return best, code


def fused_peaks_topk_pallas(maps: jax.Array, k: int, factor: int = 4,
                            method: str = 'bicubic',
                            interpret: bool = False,
                            maps_per_step: int = 1):
    """(B, h, w) stride-res maps -> (scores, ys, xs), each (B, k), of the
    top-k NMS peaks of the x`factor` upsampled maps, in FULL-resolution
    pixel coordinates. The upsampled map, its NMS and the block maxima all
    live only in VMEM; the kernel's HBM output is just 3*k scalars per map.

    Exactness: identical to upsample2d_matmul + hmp_nms + 2x2 block-reduce
    top-k (descending, ties by lowest flat block index, first-wins
    within-block) up to f32 matmul summation order.

    `maps_per_step` > 1 processes that many maps per grid step with the
    top-k extraction loop batched across them (maps stacked along sublanes,
    see `_fused_peaks_batched`); results are identical per map.
    """
    if maps_per_step > 1:
        return _fused_peaks_batched(maps, k, factor, method, interpret,
                                    maps_per_step)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = maps.shape
    assert h == w, 'square maps (the parity matrices are shared per axis)'
    assert factor % 2 == 0
    hb = h * factor // 2
    ue_np, uo_np = _parity_matrices(h, factor, method)

    def kernel(x_ref, ue_ref, uo_ref, vals_ref, ys_ref, xs_ref,
               tile_s, code_s):
        # NOTE: tie-break/extraction semantics are mirrored in
        # _fused_peaks_batched below -- apply semantic changes to BOTH
        best, code = _peaks_core(x_ref[0], ue_ref[...], uo_ref[...])
        tile_s[...] = best
        code_s[...] = code
        cols_row = jax.lax.broadcasted_iota(jnp.int32, (1, hb), 1)  # (1, hb)
        ar_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]

        # Per-row maxima kept in LANE-major (1, hb) layout: every (hb, 1)
        # sublane-major vector op costs ~hb/8 mostly-empty vregs, and the
        # extraction loop below runs k iterations of ~8 such ops -- measured
        # 88% of the kernel. One eye-masked transpose (elementwise + sublane
        # reduction, once per map) moves the maxima into lanes; the loop then
        # touches only (1, hb) vectors plus ONE dynamically-indexed row of
        # the NATURAL-orientation tile (sublane slices are cheap; the earlier
        # attempt that transposed the whole tile instead lost 4 img/s e2e to
        # the two full-tile transposes).
        rm0 = jnp.max(best, axis=1, keepdims=True)                  # (hb, 1)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 1))
        rmT0 = jnp.max(jnp.where(eye, rm0, jnp.float32(-jnp.inf)),
                       axis=0, keepdims=True)                       # (1, hb)

        # Order parity with the full-tile version: global max, ties broken by
        # lowest flat index (first tied row, then first tied column).
        def body(i, carry):
            rmT, vals, ys, xs = carry
            mval = jnp.max(rmT)
            r = jnp.min(jnp.where(rmT == mval, cols_row, hb))       # row idx
            row = tile_s[pl.ds(r, 1), :]                            # (1, hb)
            c = jnp.min(jnp.where(row == mval, cols_row, hb))
            coderow = code_s[pl.ds(r, 1), :]
            cd = jnp.max(jnp.where(cols_row == c, coderow, -1.0))
            cd = cd.astype(jnp.int32)
            masked = jnp.where(cols_row == c, jnp.float32(-jnp.inf), row)
            tile_s[pl.ds(r, 1), :] = masked
            rmT = jnp.where(cols_row == r, jnp.max(masked), rmT)
            sel = ar_k == i
            vals = jnp.where(sel, mval, vals)
            ys = jnp.where(sel, 2 * r + cd // 2, ys)
            xs = jnp.where(sel, 2 * c + cd % 2, xs)
            return rmT, vals, ys, xs

        _, vals, ys, xs = jax.lax.fori_loop(
            0, k, body,
            (rmT0, jnp.zeros((k,), jnp.float32),
             jnp.zeros((k,), jnp.int32), jnp.zeros((k,), jnp.int32)))
        vals_ref[0, 0] = vals
        ys_ref[0, 0] = ys
        xs_ref[0, 0] = xs

    out_spec = pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vals, ys, xs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, hb), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, hb), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
                   jax.ShapeDtypeStruct((b, 1, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((hb, hb), jnp.float32),
                        pltpu.VMEM((hb, hb), jnp.float32)],
        interpret=interpret,
    )(maps.astype(jnp.float32), jnp.asarray(ue_np), jnp.asarray(uo_np))
    return vals[:, 0], ys[:, 0], xs[:, 0]


def _fused_peaks_batched(maps, k, factor, method, interpret, mb):
    """`fused_peaks_topk_pallas` with `mb` maps per grid step.

    Rationale: the iterative extraction loop dominates the single-map kernel
    (~88% measured) and its vector ops run on (1, hb) / (mb, hb) tiles that
    occupy the SAME number of vregs for mb <= 8 (vregs are (8, 128); a
    one-sublane vector wastes 7/8 of each register). Stacking mb maps along
    sublanes batches every reduction/select in the loop at no extra vector
    cost; only the per-map scalar row index extraction, the two dynamic row
    reads and the one dynamic row write stay per-map (each touches a single
    (1, hb) row). The matmul/NMS phase is per-map either way.

    Per-map results are bit-identical to the single-map kernel: each map's
    scratch tile, row maxima and tie-break reductions are disjoint
    (map m owns scratch rows [m*hb, (m+1)*hb)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = maps.shape
    assert h == w, 'square maps (the parity matrices are shared per axis)'
    assert factor % 2 == 0
    hb = h * factor // 2
    ue_np, uo_np = _parity_matrices(h, factor, method)
    b_pad = -(-b // mb) * mb
    if b_pad != b:   # zero maps decode to zero-score peaks; sliced off below
        maps = jnp.concatenate(
            [maps, jnp.zeros((b_pad - b, h, w), maps.dtype)], axis=0)

    def kernel(x_ref, ue_ref, uo_ref, vals_ref, ys_ref, xs_ref,
               tile_s, code_s):
        ue, uo = ue_ref[...], uo_ref[...]
        eye = (jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 1))
        rmT_rows = []
        for m in range(mb):
            best, code = _peaks_core(x_ref[m], ue, uo)
            tile_s[m * hb:(m + 1) * hb, :] = best
            code_s[m * hb:(m + 1) * hb, :] = code
            # lane-major per-row maxima via the eye-masked transpose (see
            # the single-map kernel for why full-tile transposes lose)
            rm0 = jnp.max(best, axis=1, keepdims=True)          # (hb, 1)
            rmT_rows.append(jnp.max(
                jnp.where(eye, rm0, jnp.float32(-jnp.inf)),
                axis=0, keepdims=True))                          # (1, hb)
        rmT0 = jnp.concatenate(rmT_rows, axis=0)                 # (mb, hb)

        cols = jax.lax.broadcasted_iota(jnp.int32, (mb, hb), 1)
        rows_id = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0)
        ar_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        def body(i, carry):
            rmT, vals, ys, xs = carry
            mval = jnp.max(rmT, axis=1, keepdims=True)           # (mb, 1)
            r = jnp.min(jnp.where(rmT == mval, cols, hb),
                        axis=1, keepdims=True)                   # (mb, 1)
            # per-map scalar row index -> dynamic row reads into a stacked
            # (mb, hb) buffer; everything after is batched
            r_scalars = [jnp.min(jnp.where(rows_id == m, r, hb))
                         for m in range(mb)]
            rowbuf = jnp.concatenate(
                [tile_s[pl.ds(m * hb + r_scalars[m], 1), :]
                 for m in range(mb)], axis=0)                    # (mb, hb)
            codebuf = jnp.concatenate(
                [code_s[pl.ds(m * hb + r_scalars[m], 1), :]
                 for m in range(mb)], axis=0)
            c = jnp.min(jnp.where(rowbuf == mval, cols, hb),
                        axis=1, keepdims=True)                   # (mb, 1)
            cd = jnp.max(jnp.where(cols == c, codebuf, -1.0),
                         axis=1, keepdims=True).astype(jnp.int32)
            masked = jnp.where(cols == c, jnp.float32(-jnp.inf), rowbuf)
            for m in range(mb):
                tile_s[pl.ds(m * hb + r_scalars[m], 1), :] = masked[m:m + 1]
            rmT = jnp.where(cols == r,
                            jnp.max(masked, axis=1, keepdims=True), rmT)
            sel = ar_k == i                                      # (1, k)
            vals = jnp.where(sel, mval, vals)                    # (mb, k)
            ys = jnp.where(sel, 2 * r + cd // 2, ys)
            xs = jnp.where(sel, 2 * c + cd % 2, xs)
            return rmT, vals, ys, xs

        _, vals, ys, xs = jax.lax.fori_loop(
            0, k, body,
            (rmT0, jnp.zeros((mb, k), jnp.float32),
             jnp.zeros((mb, k), jnp.int32), jnp.zeros((mb, k), jnp.int32)))
        vals_ref[...] = vals.reshape(mb, 1, k)
        ys_ref[...] = ys.reshape(mb, 1, k)
        xs_ref[...] = xs.reshape(mb, 1, k)

    out_spec = pl.BlockSpec((mb, 1, k), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vals, ys, xs = pl.pallas_call(
        kernel,
        grid=(b_pad // mb,),
        in_specs=[pl.BlockSpec((mb, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, hb), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, hb), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b_pad, 1, k), jnp.float32),
                   jax.ShapeDtypeStruct((b_pad, 1, k), jnp.int32),
                   jax.ShapeDtypeStruct((b_pad, 1, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((mb * hb, hb), jnp.float32),
                        pltpu.VMEM((mb * hb, hb), jnp.float32)],
        interpret=interpret,
    )(maps.astype(jnp.float32), jnp.asarray(ue_np), jnp.asarray(uo_np))
    return vals[:b, 0], ys[:b, 0], xs[:b, 0]
