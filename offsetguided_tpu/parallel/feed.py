"""Single-transfer batched device feed.

The training loop ships up to nine host arrays per step (raw image canvas,
miss-mask, annotations, affine matrices, flip flags, tint, valid extents —
`data/pipeline.py` sample_spec). Issuing one `device_put` per array is
correct but pays the host->device *fixed* dispatch cost N times per step; on
remote/tunneled devices that cost is hundreds of ms per transfer (measured
~290 ms fixed regardless of payload, BENCHMARKS.md round 4), and even on a
host-attached chip each put is a separate DMA setup.

This module packs every per-sample array into ONE contiguous
`uint8[B, row_bytes]` buffer on the host — one put — and unpacks it inside
the jitted consumer with static slices + bitcasts (pure layout ops, fused by
XLA into the consumers). The batch dimension is preserved, so the packed
buffer shards along `data` exactly like the individual arrays did and the
multi-process SPMD feed (`make_array_from_process_local_data`) is unchanged.

Segments are laid out in descending-itemsize order so every 4-byte-typed
segment stays 4-byte aligned within the row.

No reference counterpart: the reference feeds via torch DataLoader +
`DataPrefetcher` on a host-attached GPU (`/root/reference/data/factory.py`,
`train_dist.py`), where per-tensor `.cuda(non_blocking=True)` is cheap.
"""
from typing import Dict, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# spec entry: (key, tail_shape, dtype_str, column_offset, row_nbytes)
FeedSpec = Tuple[Tuple[str, Tuple[int, ...], str, int, int], ...]


def build_feed_spec(batch: Dict[str, np.ndarray],
                    exclude: Sequence[str] = ()) -> FeedSpec:
    """Static packing layout for a batch dict (all arrays lead with B).

    Deterministic: keys are ordered by descending itemsize (alignment) then
    name, so the same dict shape always produces the same spec and the jitted
    unpacker never retraces across steps.
    """
    keys = [k for k in batch if k not in exclude]
    arrs = {k: np.asarray(batch[k]) for k in keys}
    keys.sort(key=lambda k: (-arrs[k].dtype.itemsize, k))
    spec = []
    off = 0
    for k in keys:
        a = arrs[k]
        nb = int(np.prod(a.shape[1:], dtype=np.int64)) * a.dtype.itemsize
        spec.append((k, tuple(a.shape[1:]), a.dtype.str, off, nb))
        off += nb
    return tuple(spec)


def row_bytes(spec: FeedSpec) -> int:
    return sum(e[4] for e in spec)


def pack_host_batch(batch: Dict[str, np.ndarray], spec: FeedSpec) -> np.ndarray:
    """dict of host arrays -> one `uint8[B, row_bytes]` buffer (one memcpy
    per array; ~1 ms for a 20 MB training batch).

    Validates every array against the spec: the jitted unpacker slices at
    the spec's STATIC offsets, so a tail-shape or dtype drift vs the batch
    the spec was built from would silently scramble every downstream array.
    """
    segs = []
    for k, tail, dt, off, nb in spec:
        a = np.ascontiguousarray(batch[k])
        if a.shape[1:] != tail or a.dtype.str != dt:
            raise ValueError(
                f'feed spec mismatch for {k!r}: batch has '
                f'{a.shape[1:]}/{a.dtype.str}, spec was built for '
                f'{tail}/{dt}')
        segs.append(a.reshape(a.shape[0], -1).view(np.uint8))
    return np.concatenate(segs, axis=1)


def unpack_device_batch(flat: jax.Array, spec: FeedSpec) -> Dict[str, jax.Array]:
    """Inverse of pack_host_batch, for use INSIDE a jitted program: static
    slices + bitcasts only, so XLA fuses the unpack into the consumers."""
    out = {}
    b = flat.shape[0]
    for k, tail, dt, off, nb in spec:
        dtype = np.dtype(dt)
        seg = jax.lax.slice_in_dim(flat, off, off + nb, axis=1)
        if dtype == np.uint8:
            arr = seg
        elif dtype == np.bool_:
            arr = seg.astype(jnp.bool_)
        else:
            seg = seg.reshape(b, nb // dtype.itemsize, dtype.itemsize)
            arr = jax.lax.bitcast_convert_type(seg, jnp.dtype(dtype))
        out[k] = arr.reshape((b,) + tail)
    return out
