"""Iterative top-k as a Pallas kernel.

`lax.top_k` sorts the whole array; after peak NMS the maps are extremely
sparse, so k rounds of (max, first-argmax, mask-out) over a VMEM-resident tile
are far cheaper than any sort. One program per (image, channel); k results
accumulate in registers via one-hot blends and are written once.

Exactness: identical values/indices to `lax.top_k` (descending, ties by lowest
index) because each round extracts the single lowest-index maximum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def topk_pallas(x: jax.Array, k: int, interpret: bool = False):
    """x: (M, H, W) -> (vals (M, k), inds (M, k) flat row-major int32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, h, w = x.shape

    def kernel(x_ref, vals_ref, inds_ref):
        big_neg = jnp.float32(-jnp.inf)
        tile = x_ref[0].astype(jnp.float32)                      # (H, W)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        flat = rows * w + cols
        ar_k = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]

        def body(i, carry):
            tile, vals, inds = carry
            mval = jnp.max(tile)
            eq = tile == mval
            idx = jnp.min(jnp.where(eq, flat, jnp.int32(h * w)))
            sel = ar_k == i
            vals = jnp.where(sel, mval, vals)
            inds = jnp.where(sel, idx, inds)
            tile = jnp.where(flat == idx, big_neg, tile)
            return tile, vals, inds

        _, vals, inds = jax.lax.fori_loop(
            0, k, body,
            (tile, jnp.zeros((k,), jnp.float32), jnp.zeros((k,), jnp.int32)))
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
