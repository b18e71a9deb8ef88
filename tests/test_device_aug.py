"""Device-side augmentation (ops/augment.py) vs the host cv2 pipeline.

Geometric parity must be tight (annotations drive GT encoding); pixel parity
vs cv2 is within interpolation quantization (cv2 computes INTER_CUBIC in
fixed point, the device in f32). Parameter sampling parity is exact: both
modes draw from the same host RNG stream in the same order.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from offsetguided_tpu.config.defaults import AugmentationConfig, SkeletonConfig
from offsetguided_tpu.data import transforms as T
from offsetguided_tpu.ops.augment import (affine_sample, augment_batch,
                                          photometric,
                                          transform_annotations)

import cv2


def _rand_mat(rng, src_hw=(80, 100), dst=64):
    params = T.sample_affine_params(AugmentationConfig(), rng)
    anns = np.zeros((1, 17, 4), np.float32)
    anns[0, :, 0] = rng.rand(17) * src_hw[1]
    anns[0, :, 1] = rng.rand(17) * src_hw[0]
    anns[0, :, 2] = 2.0
    meta = T.make_meta(src_hw[1], src_hw[0], 17)
    roi = T._roi_center(anns, meta)
    mat, sx, sy = T.build_affine_mat(params, roi, meta['width_height'],
                                     [dst, dst])
    return params, mat, sx, sy, anns, meta


def test_affine_sample_matches_cv2(rng):
    h, w, dst = 80, 100, 64
    image = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    for _ in range(3):
        _, mat, _, _, _, _ = _rand_mat(rng, (h, w), dst)
        want = cv2.warpAffine(image, mat[:2].astype(np.float64), (dst, dst),
                              flags=cv2.INTER_CUBIC,
                              borderMode=cv2.BORDER_CONSTANT,
                              borderValue=T.PAD_RGB)
        got = affine_sample(jnp.asarray(image[None]),
                            jnp.asarray(np.linalg.inv(mat)[:2], jnp.float32)[None],
                            (dst, dst), jnp.asarray(T.PAD_RGB, jnp.float32))
        got = np.clip(np.round(np.asarray(got[0])), 0, 255).astype(np.uint8)
        diff = np.abs(got.astype(int) - want.astype(int))
        # cv2 fixed-point vs f32: the bulk must agree to the LSB; allow a
        # small tail of near-boundary / steep-gradient pixels
        assert np.mean(diff <= 1) > 0.97, np.mean(diff <= 1)
        assert np.mean(diff) < 1.0, np.mean(diff)


def test_patch_gather_matches_tap_loop_oracle(rng):
    """The production affine_sample (one 4x4-patch gather + separable-weight
    einsum, row-chunked) must be numerically equivalent to the 16-tap
    reference formulation (_affine_sample_taps) everywhere — interior,
    image borders, and valid_hw-cropped canvases with multi-channel border
    constants."""
    from offsetguided_tpu.ops.augment import _affine_sample_taps

    h, w = 45, 57
    images = (rng.rand(3, h, w, 4) * 255).astype(np.uint8)
    border = jnp.asarray([124.0, 116.0, 104.0, 255.0])
    for trial in range(4):
        # random affine incl. strong rotation + scale so footprints cross
        # every border; last trial pushes most samples out of bounds
        th = rng.uniform(-0.8, 0.8)
        s = rng.uniform(0.4, 2.2) if trial < 3 else 4.0
        mats = np.stack([np.array(
            [[np.cos(th) * s, -np.sin(th) * s, rng.uniform(-20, 20)],
             [np.sin(th) * s, np.cos(th) * s, rng.uniform(-20, 20)]],
            np.float32) for _ in range(3)])
        valid = np.stack([[h, w], [h - 7, w - 11], [13, 9]]).astype(np.int32)
        got = affine_sample(jnp.asarray(images), jnp.asarray(mats),
                            (31, 50), border, jnp.asarray(valid),
                            row_chunk=8)
        want = _affine_sample_taps(jnp.asarray(images), jnp.asarray(mats),
                                   (31, 50), border, jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=5e-3)


def test_tiled_warp_matches_tap_loop_oracle(rng):
    """affine_sample_tiled (windowed banded-matmul warp) vs the 16-tap
    oracle: interior, borders, cropped valid_hw, far-out-of-bounds, AND an
    image large enough that the static source window is a real sub-window
    (not the whole-image degenerate clamp). Tolerance is accumulation-order
    noise (<0.05 of 255, far below the final uint8 rounding)."""
    from offsetguided_tpu.ops.augment import (_affine_sample_taps,
                                              affine_sample_tiled)

    border = jnp.asarray([124.0, 116.0, 104.0, 255.0])
    for (h, w, oh, ow) in ((45, 57, 31, 50), (400, 360, 128, 144)):
        images = (rng.rand(2, h, w, 4) * 255).astype(np.uint8)
        for trial in range(3):
            th = rng.uniform(-0.8, 0.8)
            s = rng.uniform(0.4, 2.1) if trial < 2 else 4.0
            off = 20 if trial < 2 else 5000     # last trial: all-border
            mats = np.stack([np.array(
                [[np.cos(th) * s, -np.sin(th) * s, rng.uniform(-off, off)],
                 [np.sin(th) * s, np.cos(th) * s, rng.uniform(-off, off)]],
                np.float32) for _ in range(2)])
            valid = np.stack([[h, w], [h - 7, w - 11]]).astype(np.int32)
            got = affine_sample_tiled(jnp.asarray(images), jnp.asarray(mats),
                                      (oh, ow), border, jnp.asarray(valid),
                                      slope_bound=4.5)
            want = _affine_sample_taps(jnp.asarray(images), jnp.asarray(mats),
                                       (oh, ow), border, jnp.asarray(valid))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-3, atol=0.05)


def test_transform_annotations_matches_host(rng):
    h, w, dst = 80, 100, 64
    sk = SkeletonConfig()
    left = [i for i, n in enumerate(sk.keypoints) if n.startswith('left')]
    right = [i for i, n in enumerate(sk.keypoints) if n.startswith('right')]
    for flip in (False, True):
        params, mat, sx, sy, anns, meta = _rand_mat(rng, (h, w), dst)
        params['flip'] = flip
        mat, sx, sy = T.build_affine_mat(params, T._roi_center(anns, meta),
                                         meta['width_height'], [dst, dst])
        img = np.zeros((h, w, 3), np.uint8)
        _, host_anns, _, _ = T.warp_affine(img, anns.copy(), dict(meta), None,
                                           params, dst, left, right)
        dev = transform_annotations(
            jnp.asarray(anns[None]), jnp.asarray(mat, jnp.float32)[None],
            jnp.asarray([[sx, sy]], jnp.float32),
            jnp.asarray([flip]), left, right, dst)
        np.testing.assert_allclose(np.asarray(dev[0]), host_anns,
                                   rtol=1e-4, atol=2e-3)


def test_photometric_gray_matches_cv2(rng):
    img = (rng.rand(2, 32, 32, 3) * 255).astype(np.float32)
    out = photometric(jnp.asarray(img),
                      jnp.asarray([True, False]),
                      jnp.zeros((2, 4), jnp.float32))
    out = np.asarray(out)
    want = T.to_gray(img[0].astype(np.uint8))
    got = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    np.testing.assert_array_equal(np.round(out[1]), np.round(img[1]))


def test_photometric_tint_close_to_cv2(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    shifts = (5, -20, 15)
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int32)
    hsv[:, :, 0] = (hsv[:, :, 0] + shifts[0]) % 180
    hsv[:, :, 1] = np.clip(hsv[:, :, 1] + shifts[1], 0, 255)
    hsv[:, :, 2] = np.clip(hsv[:, :, 2] + shifts[2], 0, 255)
    want = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    tints = jnp.asarray([[1.0, *shifts]], jnp.float32)
    got = photometric(jnp.asarray(img[None], jnp.float32),
                      jnp.asarray([False]), tints)
    got = np.clip(np.round(np.asarray(got[0])), 0, 255).astype(np.uint8)
    # cv2 quantizes H to 2-degree bins and S to /255 steps before shifting;
    # float HSV differs by quantization only
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.mean(diff) < 4.0, np.mean(diff)
    assert np.median(diff) <= 2.0


def test_device_mode_sample_parity_with_host_mode(rng, tmp_path):
    """Same RNG stream -> identical aug parameters; device-transformed
    annotations match the host pipeline's post-warp annotations."""
    from offsetguided_tpu.data.pipeline import CocoKeypoints
    from offsetguided_tpu.cli.selfcheck import make_dataset

    img_dir, ann_file = make_dataset(tmp_path / 'ds', n_images=2)
    kw = dict(skeleton=SkeletonConfig(), square_length=128, max_persons=8)
    host_ds = CocoKeypoints(str(img_dir), str(ann_file), **kw)
    # raw_canvas covers the 320-wide sources: no host pre-downscale, exact
    # same matrix as the host path
    dev_ds = CocoKeypoints(str(img_dir), str(ann_file), device_aug=True,
                           raw_canvas=320, **kw)

    for i in range(2):
        host = host_ds.get(i, np.random.RandomState(42 + i))
        dev = dev_ds.get(i, np.random.RandomState(42 + i))
        imgs, mask, anns = augment_batch(
            jnp.asarray(dev['image'][None]),
            jnp.asarray(dev['mask_miss'][None]),
            jnp.asarray(dev['anns'][None]),
            jnp.asarray(dev['aug_mat'][None]),
            jnp.asarray(dev['aug_mat_inv'][None]),
            jnp.asarray(dev['aug_scale_xy'][None]),
            jnp.asarray([dev['aug_flags'][0] > 0.5]),
            jnp.asarray([dev['aug_flags'][1] > 0.5]),
            jnp.asarray(dev['aug_tint'][None]),
            jnp.asarray(dev['valid_hw'][None]),
            128, dev_ds.left_index, dev_ds.right_index)
        np.testing.assert_allclose(np.asarray(anns[0]), host['anns'],
                                   rtol=1e-4, atol=3e-3)
        # images: same geometry, quantization-level pixel differences
        hi = host['image'].astype(np.float32)
        di = np.asarray(imgs[0]).astype(np.float32)
        assert np.mean(np.abs(hi - di) <= 2) > 0.9, np.mean(np.abs(hi - di))
        # mask: host ships uint8 of the cubic-warped mask
        hm = host['mask_miss'].astype(np.float32) / 255.0
        dm = np.asarray(mask[0])
        assert np.mean(np.abs(hm - dm) < 0.05) > 0.97


def test_worker_count_invariance_device_aug(tmp_path):
    """Device-aug batches (incl. the new aug-parameter arrays through the
    shared-memory transport) are identical for 0 and 2 loader workers."""
    from offsetguided_tpu.data.pipeline import CocoKeypoints, batch_iterator
    from offsetguided_tpu.cli.selfcheck import make_dataset

    img_dir, ann_file = make_dataset(tmp_path / 'ds', n_images=5)
    ds = CocoKeypoints(str(img_dir), str(ann_file), square_length=64,
                       max_persons=4, device_aug=True, raw_canvas=320)
    grab = lambda nw: [
        {k: v for k, v in b.items() if k not in ('metas', 'epoch')}
        for b in batch_iterator(ds, 2, seed=7, epochs=1, num_workers=nw)]
    serial = grab(0)
    workers = grab(2)
    assert len(serial) == len(workers) > 0
    for a, b in zip(serial, workers):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cubic_weights_match_resize_kernel():
    """ops/augment._cubic_w must stay the same Keys a=-0.75 polynomial as
    ops/resize._cubic_kernel (decoder upsampling) — pinned against drift."""
    from offsetguided_tpu.ops.augment import _cubic_w
    from offsetguided_tpu.ops.resize import _cubic_kernel
    d = np.linspace(-2.5, 2.5, 101)
    # f32 (jnp default) vs f64 evaluation of the same polynomial
    np.testing.assert_allclose(np.asarray(_cubic_w(jnp.asarray(d))),
                               _cubic_kernel(d), rtol=3e-4, atol=2e-6)


def test_device_mode_meta_matches_host_mode(tmp_path):
    """Device-aug metas must describe the warped geometry exactly like
    host-mode metas (inverse transforms consume them)."""
    from offsetguided_tpu.data.pipeline import CocoKeypoints
    from offsetguided_tpu.cli.selfcheck import make_dataset

    img_dir, ann_file = make_dataset(tmp_path / 'ds', n_images=1)
    kw = dict(skeleton=SkeletonConfig(), square_length=128, max_persons=8)
    host = CocoKeypoints(str(img_dir), str(ann_file), **kw).get(
        0, np.random.RandomState(5))
    dev = CocoKeypoints(str(img_dir), str(ann_file), device_aug=True,
                        raw_canvas=320, **kw).get(
        0, np.random.RandomState(5))
    hm, dm = host['meta'], dev['meta']
    assert hm['hflip'] == dm['hflip']
    np.testing.assert_allclose(dm['affine_mat'], hm['affine_mat'],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dm['scale'], hm['scale'])
    assert dm['rotate'] == hm['rotate']
    np.testing.assert_array_equal(dm['width_height'], hm['width_height'])
    np.testing.assert_array_equal(dm['joint_channel_ind'],
                                  hm['joint_channel_ind'])


def test_device_aug_shards_over_data_axis(tmp_path):
    """The device-aug program (warp gathers + photometric + ann transform)
    must compile and run batch-sharded over the virtual multi-device mesh —
    every op is per-sample, so XLA partitions it without collectives."""
    import jax
    from offsetguided_tpu.data.pipeline import CocoKeypoints
    from offsetguided_tpu.cli.selfcheck import make_dataset
    from offsetguided_tpu.ops.augment import augment_batch_dict
    from offsetguided_tpu.parallel import batch_sharding, make_mesh

    n_dev = jax.device_count()
    if n_dev < 2:
        pytest.skip('needs multi-device host platform')
    img_dir, ann_file = make_dataset(tmp_path / 'ds', n_images=2)
    ds = CocoKeypoints(str(img_dir), str(ann_file), square_length=64,
                       max_persons=4, device_aug=True, raw_canvas=320)
    rng = np.random.RandomState(0)
    samples = [ds.get(i % len(ds), rng) for i in range(n_dev)]
    batch = {k: np.stack([s[k] for s in samples])
             for k in ds.sample_spec()}

    mesh = make_mesh(n_dev, 1)
    bsh = batch_sharding(mesh)
    dev = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}
    with mesh:
        imgs, mask, anns = jax.jit(
            lambda b: augment_batch_dict(b, 64, ds.left_index,
                                         ds.right_index))(dev)
        imgs = np.asarray(imgs)
    assert imgs.shape == (n_dev, 64, 64, 3)
    # sharded result == single-device result
    ref_i, ref_m, ref_a = augment_batch_dict(
        {k: jnp.asarray(v) for k, v in batch.items()}, 64,
        ds.left_index, ds.right_index)
    # partitioned vs fused fma ordering can flip round() by 1 LSB
    assert np.abs(imgs.astype(int) - np.asarray(ref_i).astype(int)).max() <= 1
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref_m),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(anns), np.asarray(ref_a),
                               rtol=1e-6, atol=1e-5)
