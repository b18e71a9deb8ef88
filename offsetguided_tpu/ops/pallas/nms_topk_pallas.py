"""Fused peak NMS + top-k as one Pallas kernel.

Takes raw (bicubic-upsampled) heatmap channels and produces each channel's
top-k peak values and positions in a single VMEM-resident pass: the 3x3
peak suppression is eight shifted max-compares (zero-padded borders, matching
decoder/heatmap.py:15-35), and selection is k rounds of
(max, lowest-index-argmax, mask-out) -- the NMS output is sparse, so iterative
extraction beats any sort, and the block-reduce + candidate-gather +
layout-shuffle stages of the unfused path disappear entirely.

Exactness: values and indices identical to
`lax.top_k(hmp_nms(x).reshape(-1))` (descending, ties by lowest index).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nms_topk_pallas(x: jax.Array, k: int, interpret: bool = False):
    """x: (M, H, W) raw channel maps -> (vals (M, k), flat row-major inds)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, h, w = x.shape

    def kernel(x_ref, vals_ref, inds_ref):
        t = x_ref[0].astype(jnp.float32)                        # (H, W)
        zrow = jnp.zeros((1, w), jnp.float32)
        up = jnp.concatenate([t[1:], zrow], axis=0)
        down = jnp.concatenate([zrow, t[:-1]], axis=0)
        rmax = jnp.maximum(t, jnp.maximum(up, down))            # row-window max
        zcol = jnp.zeros((h, 1), jnp.float32)
        left = jnp.concatenate([rmax[:, 1:], zcol], axis=1)
        right = jnp.concatenate([zcol, rmax[:, :-1]], axis=1)
        hmax = jnp.maximum(rmax, jnp.maximum(left, right))
        nmsed = jnp.where(hmax == t, t, 0.0)                    # zero non-peaks

        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        flat = rows * w + cols
        ar_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]

        def body(i, carry):
            tile, vals, inds = carry
            mval = jnp.max(tile)
            idx = jnp.min(jnp.where(tile == mval, flat, jnp.int32(h * w)))
            sel = ar_k == i
            vals = jnp.where(sel, mval, vals)
            inds = jnp.where(sel, idx, inds)
            tile = jnp.where(flat == idx, jnp.float32(-jnp.inf), tile)
            return tile, vals, inds

        _, vals, inds = jax.lax.fori_loop(
            0, k, body,
            (nmsed, jnp.zeros((k,), jnp.float32), jnp.zeros((k,), jnp.int32)))
        vals_ref[0, 0] = vals
        inds_ref[0, 0] = inds

    vals, inds = pl.pallas_call(
        kernel,
        grid=(m,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((m, 1, k), jnp.int32),
        ),
        interpret=interpret,
    )(x)
    return vals[:, 0], inds[:, 0]
