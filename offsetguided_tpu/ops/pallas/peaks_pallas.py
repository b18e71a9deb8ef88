"""Fused peak finding: bicubic x4 upsample + 3x3 NMS + 2x2 block-max in one
Pallas kernel, phase-decomposed so the full-resolution heatmap NEVER exists.

The reference decodes peaks from the x4-bicubic-upsampled heatmap
(decoder/factory.py:74-88 + heatmap.py:15-49). Materializing that
(N, 4h, 4w, C) fp32 map costs ~223MB of HBM traffic per batch-8 at 640^2 and
three full passes (upsample write, NMS read/write, block-max read) -- ~7ms.

Key identity: an integer-factor interpolation has exactly `factor` distinct
fractional phases per axis, so the x`factor` upsample decomposes into
factor^2 per-phase planes U[py][px] of the SOURCE shape (h, w), each a
4-tap separable FMA over clamp-shifted copies of the source -- pure f32
VPU work, bit-matching `ops.resize.upsample2d` (the canonical shift-path
order the peak-sampling path also reproduces). No MXU dot ever touches the
heatmap values, so there is no bf16 truncation to work around (TPU f32
matmuls at DEFAULT truncate inputs to bf16; the dense-matmul formulation of
this kernel needed `precision='highest'` = 6 MXU passes over a matrix that
is ~4-banded -- measured +1.4 ms/batch-8 at 640^2).

On the phase planes the rest of the chain is elementwise:

  - 3x3 NMS = separable maxes ACROSS phase planes at unit shifts (full-res
    pixel (f*i+py, f*j+px): its y-neighbors live in phase py+-1, wrapping
    into the adjacent source cell at the phase boundary); zero fill at the
    image border matches the reference's F.pad,
  - 2x2 block-max: block (2i+sy, 2j+sx) for sy,sx < f/2 collapses phase
    planes {2sy, 2sy+1} x {2sx, 2sx+1} with a first-wins (row-major) code.

Block values/codes are stored QUADRANT-major -- tile row sy*h + i holds
block row S*i + sy (S = f/2) -- because lane-interleaving planes is not a
cheap Mosaic operation while zero-pad + add assembles quadrants for free.
The top-k extraction preserves the reference tie order (descending value,
ties by lowest flat block index) by comparing against a block-index KEY
vector instead of the raw tile iota.

Outputs (block values, block argmax code) at quarter resolution; the
downstream top-k then runs on 1/4 of the data and final coordinates are
ys = 2*by + code//2, xs = 2*bx + code%2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..resize import _phase_table


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


def _clamp_shift0(x, off):
    """y[i, :] = x[clamp(i + off, 0, h-1), :] (torch edge replication)."""
    if off == 0:
        return x
    h = x.shape[0]
    y = _shift0(x, -off)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if off < 0:
        return jnp.where(rows < -off, x[0:1, :], y)
    return jnp.where(rows >= h - off, x[h - 1:h, :], y)


def _clamp_shift1(x, off):
    if off == 0:
        return x
    w = x.shape[1]
    y = _shift1(x, -off)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if off < 0:
        return jnp.where(cols < -off, x[:, 0:1], y)
    return jnp.where(cols >= w - off, x[:, w - 1:w], y)


def _upsample_phases(x, factor, method):
    """(h, w) -> planes[py][px], each (h, w): per-phase planes of the
    x`factor` 2D upsample, U[py][px][i, j] = up(x)[factor*i+py, factor*j+px].

    Values bit-match `ops.resize.upsample2d` (H pass then W pass, taps
    accumulated in offset order, exact-zero taps skipped -- the same
    term-by-term order `upsample_axis` uses)."""
    offsets, weights = _phase_table(factor, method)
    offsets = [int(o) for o in offsets]

    def axis_pass(src_planes, clamp_shift):
        # src_planes: list of (h, w); returns [phase][same list len] planes
        out = []
        for p in range(factor):
            taps = [(off, float(weights[p, t]))
                    for t, off in enumerate(offsets)
                    if float(weights[p, t]) != 0.0]
            row = []
            for s in src_planes:
                acc = None
                for off, wt in taps:
                    term = clamp_shift(s, off) * jnp.float32(wt)
                    acc = term if acc is None else acc + term
                row.append(acc)
            out.append(row)
        return out

    ys = [r[0] for r in axis_pass([x], _clamp_shift0)]       # [py] (h, w)
    return axis_pass(ys, _clamp_shift1)   # [px][py]; transposed by caller


def _peaks_core(x, factor, method):
    """(h, w) map -> (best, code), each (h*f/2, w*f/2), quadrant-major.

    Tile row sy*h + i / col sx*w + j holds block (S*i + sy, S*j + sx),
    S = factor//2. `code` is the first-wins row-major 2x2 within-block
    argmax (0..3) as f32."""
    f = factor
    S = f // 2
    h, w = x.shape
    upx = _upsample_phases(x, f, method)     # [px][py]
    u = [[upx[px][py] for px in range(f)] for py in range(f)]   # [py][px]

    # separable 3x3 neighborhood max across phase planes. Row pass: the
    # y-neighbors of phase py are phases py-1/py+1, crossing into the
    # adjacent source cell (unit shift, zero fill) at the phase boundary.
    g = [[None] * f for _ in range(f)]
    for py in range(f):
        for px in range(f):
            same = u[py][px]
            prev = (u[py - 1][px] if py > 0
                    else _shift0(u[f - 1][px], 1))
            nxt = (u[py + 1][px] if py < f - 1
                   else _shift0(u[0][px], -1))
            g[py][px] = jnp.maximum(jnp.maximum(prev, same), nxt)
    nms = [[None] * f for _ in range(f)]
    for py in range(f):
        for px in range(f):
            same = g[py][px]
            prev = (g[py][px - 1] if px > 0
                    else _shift1(g[py][f - 1], 1))
            nxt = (g[py][px + 1] if px < f - 1
                   else _shift1(g[py][0], -1))
            hmax = jnp.maximum(jnp.maximum(prev, same), nxt)
            nms[py][px] = jnp.where(u[py][px] == hmax, u[py][px], 0.0)

    # 2x2 block-max + first-wins (row-major) within-block code, per quadrant
    brow_b, brow_c = [], []
    for sy in range(S):
        cells_b, cells_c = [], []
        for sx in range(S):
            planes = (nms[2 * sy][2 * sx], nms[2 * sy][2 * sx + 1],
                      nms[2 * sy + 1][2 * sx], nms[2 * sy + 1][2 * sx + 1])
            best = planes[0]
            code = jnp.zeros_like(best)
            for idx, plane in ((1.0, planes[1]), (2.0, planes[2]),
                               (3.0, planes[3])):
                upd = plane > best
                code = jnp.where(upd, idx, code)
                best = jnp.where(upd, plane, best)
            cells_b.append(best)
            cells_c.append(code)
        # lane-assemble the quadrant row by zero-pad + add (disjoint support)
        brow_b.append(sum(
            jnp.pad(c, ((0, 0), (sx * w, (S - 1 - sx) * w)))
            for sx, c in enumerate(cells_b)))
        brow_c.append(sum(
            jnp.pad(c, ((0, 0), (sx * w, (S - 1 - sx) * w)))
            for sx, c in enumerate(cells_c)))
    if S == 1:
        return brow_b[0], brow_c[0]
    return (jnp.concatenate(brow_b, axis=0),
            jnp.concatenate(brow_c, axis=0))


def _block_key(n_rows, h, S, shape, axis):
    """Key vector mapping tile index l = sy*h + i -> block index S*i + sy,
    as a broadcasted iota-derived int32 array of `shape` along `axis`."""
    l = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    sy = jnp.zeros_like(l)
    for t in range(1, S):
        sy = sy + (l >= t * h).astype(jnp.int32)
    i = l - h * sy
    return S * i + sy


def fused_peaks_topk_pallas(maps: jax.Array, k: int, factor: int = 4,
                            method: str = 'bicubic',
                            interpret: bool = False,
                            maps_per_step: int = 1):
    """(B, h, w) stride-res maps -> (scores, ys, xs), each (B, k), of the
    top-k NMS peaks of the x`factor` upsampled maps, in FULL-resolution
    pixel coordinates. The upsampled map, its NMS and the block maxima all
    live only in VMEM; the kernel's HBM output is just 3*k scalars per map.

    Exactness: identical to upsample2d + hmp_nms + 2x2 block-reduce
    top-k (descending, ties by lowest flat block index, first-wins
    within-block); the interpolation is exact f32 (shift-path FMAs, no
    MXU truncation), matching the canonical `ops.resize.upsample2d` order
    term by term.

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
    assert h == w, 'square maps (block keys are shared per axis)'
    assert factor % 2 == 0
    S = factor // 2
    hb = h * factor // 2

    def kernel(x_ref, vals_ref, ys_ref, xs_ref, tile_s, code_s):
        # NOTE: tie-break/extraction semantics are mirrored in
        # _fused_peaks_batched below -- apply semantic changes to BOTH
        best, code = _peaks_core(x_ref[0], factor, method)
        tile_s[...] = best
        code_s[...] = code
        cols_row = jax.lax.broadcasted_iota(jnp.int32, (1, hb), 1)  # (1, hb)
        key_row = _block_key(hb, h, S, (1, hb), 1)   # tile idx -> block idx
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

        # Order parity with the XLA chain: global max, ties broken by lowest
        # flat BLOCK index -- selection minimizes the block-index key (the
        # tile is quadrant-major), then the scalar tile row is derived from
        # the winning block row.
        def body(i, carry):
            rmT, vals, ys, xs = carry
            mval = jnp.max(rmT)
            by = jnp.min(jnp.where(rmT == mval, key_row, hb))   # block row
            r = (by % S) * h + by // S                          # tile row
            row = tile_s[pl.ds(r, 1), :]                        # (1, hb)
            bx = jnp.min(jnp.where(row == mval, key_row, hb))   # block col
            coderow = code_s[pl.ds(r, 1), :]
            cd = jnp.max(jnp.where(key_row == bx, coderow, -1.0))
            cd = cd.astype(jnp.int32)
            masked = jnp.where(key_row == bx, jnp.float32(-jnp.inf), row)
            tile_s[pl.ds(r, 1), :] = masked
            rmT = jnp.where(cols_row == r, jnp.max(masked), rmT)
            sel = ar_k == i
            vals = jnp.where(sel, mval, vals)
            ys = jnp.where(sel, 2 * by + cd // 2, ys)
            xs = jnp.where(sel, 2 * bx + cd % 2, xs)
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
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
                   jax.ShapeDtypeStruct((b, 1, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((hb, hb), jnp.float32),
                        pltpu.VMEM((hb, hb), jnp.float32)],
        interpret=interpret,
    )(maps.astype(jnp.float32))
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
    (1, hb) row). The upsample/NMS phase is per-map either way.

    Per-map results are bit-identical to the single-map kernel: each map's
    scratch tile, row maxima and tie-break reductions are disjoint
    (map m owns scratch rows [m*hb, (m+1)*hb)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = maps.shape
    assert h == w, 'square maps (block keys are shared per axis)'
    assert factor % 2 == 0
    S = factor // 2
    hb = h * factor // 2
    b_pad = -(-b // mb) * mb
    if b_pad != b:   # zero maps decode to zero-score peaks; sliced off below
        maps = jnp.concatenate(
            [maps, jnp.zeros((b_pad - b, h, w), maps.dtype)], axis=0)

    def kernel(x_ref, vals_ref, ys_ref, xs_ref, tile_s, code_s):
        eye = (jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 1))
        rmT_rows = []
        for m in range(mb):
            best, code = _peaks_core(x_ref[m], factor, method)
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
        keys = _block_key(hb, h, S, (mb, hb), 1)     # tile idx -> block idx
        rows_id = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0)
        ar_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        def body(i, carry):
            rmT, vals, ys, xs = carry
            mval = jnp.max(rmT, axis=1, keepdims=True)           # (mb, 1)
            by = jnp.min(jnp.where(rmT == mval, keys, hb),
                         axis=1, keepdims=True)                  # (mb, 1)
            r = (by % S) * h + by // S                           # tile rows
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
            bx = jnp.min(jnp.where(rowbuf == mval, keys, hb),
                         axis=1, keepdims=True)                  # (mb, 1)
            cd = jnp.max(jnp.where(keys == bx, codebuf, -1.0),
                         axis=1, keepdims=True).astype(jnp.int32)
            masked = jnp.where(keys == bx, jnp.float32(-jnp.inf), rowbuf)
            for m in range(mb):
                tile_s[pl.ds(m * hb + r_scalars[m], 1), :] = masked[m:m + 1]
            rmT = jnp.where(cols == r,
                            jnp.max(masked, axis=1, keepdims=True), rmT)
            sel = ar_k == i                                      # (1, k)
            vals = jnp.where(sel, mval, vals)                    # (mb, k)
            ys = jnp.where(sel, 2 * by + cd // 2, ys)
            xs = jnp.where(sel, 2 * bx + cd % 2, xs)
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
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b_pad, 1, k), jnp.float32),
                   jax.ShapeDtypeStruct((b_pad, 1, k), jnp.int32),
                   jax.ShapeDtypeStruct((b_pad, 1, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((mb * hb, hb), jnp.float32),
                        pltpu.VMEM((mb * hb, hb), jnp.float32)],
        interpret=interpret,
    )(maps.astype(jnp.float32))
    return vals[:b, 0], ys[:b, 0], xs[:b, 0]
