"""Single-transfer batched device feed (parallel/feed.py).

The feed packs every per-sample host array into one uint8[B, row_bytes]
buffer (one device_put per step instead of up to nine) and unpacks inside
the jitted consumer with static slices + bitcasts. These tests pin:
exact round-trip for every dtype the pipeline ships, spec determinism,
alignment ordering, and that the packed buffer shards along the batch dim
on a device mesh exactly like the individual arrays would.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from offsetguided_tpu.parallel.feed import (build_feed_spec, pack_host_batch,
                                            row_bytes, unpack_device_batch)


def _batch(rng, b=6):
    return {
        'image': (rng.rand(b, 40, 48, 3) * 255).astype(np.uint8),
        'mask_miss': (rng.rand(b, 40, 48) > 0.3).astype(np.uint8),
        'anns': rng.randn(b, 5, 17, 3).astype(np.float32),
        'aug_mat': rng.randn(b, 3, 3).astype(np.float32),
        'aug_flags': (rng.rand(b, 2) > 0.5).astype(np.float32),
        'valid_hw': rng.randint(1, 40, (b, 2)).astype(np.int32),
        'metas': ['dropme'] * b,
    }


def test_pack_unpack_roundtrip_exact():
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    spec = build_feed_spec(batch, exclude=('metas',))
    flat = pack_host_batch(batch, spec)
    assert flat.dtype == np.uint8 and flat.shape == (6, row_bytes(spec))

    out = jax.jit(lambda f: unpack_device_batch(f, spec))(jnp.asarray(flat))
    assert set(out) == set(batch) - {'metas'}
    for k in out:
        got = np.asarray(out[k])
        assert got.dtype == batch[k].dtype, k
        np.testing.assert_array_equal(got, batch[k], err_msg=k)


def test_spec_deterministic_and_aligned():
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    spec = build_feed_spec(batch, exclude=('metas',))
    # same layout regardless of dict insertion order
    shuffled = {k: batch[k] for k in reversed(list(batch))}
    assert build_feed_spec(shuffled, exclude=('metas',)) == spec
    # descending itemsize: every 4-byte segment starts 4-aligned
    sizes = [np.dtype(dt).itemsize for _, _, dt, _, _ in spec]
    assert sizes == sorted(sizes, reverse=True)
    for _, _, dt, off, _ in spec:
        assert off % np.dtype(dt).itemsize == 0


def test_noncontiguous_and_scalar_tail():
    rng = np.random.RandomState(2)
    batch = {
        'a': np.asfortranarray(rng.randn(4, 3, 5).astype(np.float32)),
        'b': rng.randn(4).astype(np.float32),            # tail = ()
        'c': (rng.rand(4, 7) > 0.5),                     # bool
    }
    spec = build_feed_spec(batch)
    out = jax.jit(lambda f: unpack_device_batch(f, spec))(
        jnp.asarray(pack_host_batch(batch, spec)))
    for k in batch:
        assert np.asarray(out[k]).dtype == np.asarray(batch[k]).dtype
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k], err_msg=k)


def test_packed_buffer_shards_on_batch_dim():
    """The whole point of keeping the leading B: the one-put buffer shards
    along `data` and the jitted unpack runs under that sharding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device CPU mesh')
    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    bsh = NamedSharding(mesh, P('data'))

    rng = np.random.RandomState(3)
    batch = _batch(rng, b=8)
    spec = build_feed_spec(batch, exclude=('metas',))
    flat = jax.device_put(pack_host_batch(batch, spec), bsh)
    assert len(flat.addressable_shards) == 8
    out = jax.jit(lambda f: unpack_device_batch(f, spec))(flat)
    np.testing.assert_array_equal(np.asarray(out['anns']), batch['anns'])
    np.testing.assert_array_equal(np.asarray(out['image']), batch['image'])
