"""COCO data layer: RLE decode, masks, transforms round-trips."""
import numpy as np

from offsetguided_tpu.config import COCO_PERSON_SIGMAS, LEFT_INDEX, RIGHT_INDEX
from offsetguided_tpu.data import transforms as T
from offsetguided_tpu.data.coco import (build_miss_masks, polygons_to_mask,
                                        rle_decode_counts, rle_to_mask)


def rle_encode_counts(counts):
    """Test-only inverse of rle_decode_counts (COCO compressed RLE writer)."""
    s = []
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or
                        (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return ''.join(s)


def test_rle_roundtrip(rng):
    mask = (rng.rand(23, 17) > 0.6).astype(np.uint8)
    # column-major runs
    flat = mask.T.reshape(-1)
    counts = []
    run_val, run_len = 0, 0
    for v in flat:
        if v == run_val:
            run_len += 1
        else:
            counts.append(run_len)
            run_val, run_len = v, 1
    counts.append(run_len)
    s = rle_encode_counts(counts)
    assert rle_decode_counts(s) == counts
    dec = rle_to_mask({'size': [23, 17], 'counts': s})
    np.testing.assert_array_equal(dec, mask)
    dec2 = rle_to_mask({'size': [23, 17], 'counts': counts})
    np.testing.assert_array_equal(dec2, mask)


def test_polygon_mask():
    m = polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.sum() >= 64


def test_build_miss_masks():
    anns = [
        {'segmentation': [[0, 0, 8, 0, 8, 8, 0, 8]], 'iscrowd': 0,
         'num_keypoints': 5, 'area': 2000},
        {'segmentation': [[10, 10, 15, 10, 15, 15, 10, 15]], 'iscrowd': 0,
         'num_keypoints': 0, 'area': 2000},
    ]
    miss, mall = build_miss_masks(anns, 20, 20)
    assert miss[12, 12] == 0      # keypoint-less person masked out
    assert miss[4, 4] == 255      # annotated person visible
    assert mall[4, 4] == 255 and mall[12, 12] == 255


def test_normalize_annotations():
    anns = [{'keypoints': [5.0, 6.0, 2.0] * 17, 'bbox': [0, 0, 30, 40],
             'area': 5000, 'iscrowd': 0, 'num_keypoints': 17}]
    out = T.normalize_annotations(anns, COCO_PERSON_SIGMAS)
    assert out.shape == (1, 17, 4)
    scale = np.sqrt(30 * 40)
    np.testing.assert_allclose(out[0, :, 3],
                               scale * np.asarray(COCO_PERSON_SIGMAS),
                               rtol=1e-6)


def test_rescale_pad_inverse_roundtrip(rng):
    img = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
    anns = np.zeros((2, 17, 4), np.float32)
    anns[:, :, 0] = rng.rand(2, 17) * 150
    anns[:, :, 1] = rng.rand(2, 17) * 100
    anns[:, :, 2] = 2
    anns[:, :, 3] = 5.0
    meta = T.make_meta(150, 100)
    orig = anns.copy()
    img2, anns2, meta2 = T.rescale_long_absolute(img, anns, meta, 64)
    img3, anns3, meta3 = T.center_pad(img2, anns2, meta2, 64)
    assert img3.shape == (64, 64, 3)
    rec = T.annotations_inverse(anns3, meta3)
    np.testing.assert_allclose(rec[:, :, :2], orig[:, :, :2], atol=1e-4)
    np.testing.assert_allclose(rec[:, :, 3], orig[:, :, 3], atol=1e-4)


def test_fixed_height_roundtrip(rng):
    img = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
    anns = np.zeros((1, 17, 4), np.float32)
    anns[:, :, 0] = rng.rand(1, 17) * 150
    anns[:, :, 1] = rng.rand(1, 17) * 100
    anns[:, :, 2] = 2
    anns[:, :, 3] = 3.0
    meta = T.make_meta(150, 100)
    orig = anns.copy()
    img2, anns2, meta2 = T.rescale_high_absolute(img, anns, meta, 64)
    img3, anns3, meta3 = T.rightdown_pad(img2, anns2, meta2, 32)
    assert img3.shape[0] == 64 and img3.shape[1] % 32 == 0
    rec = T.annotations_inverse(anns3, meta3)
    np.testing.assert_allclose(rec[:, :, :2], orig[:, :, :2], atol=1e-4)


def test_rescale_relative_square_pad_roundtrip(rng):
    """rescale_relative + square_pad (reference transforms/scale.py:124-136,
    pad.py:63-70) invert exactly through annotations_inverse."""
    img = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
    anns = np.zeros((2, 17, 4), np.float32)
    anns[:, :, 0] = rng.rand(2, 17) * 150
    anns[:, :, 1] = rng.rand(2, 17) * 100
    anns[:, :, 2] = 2
    anns[:, :, 3] = 5.0
    meta = T.make_meta(150, 100)
    orig = anns.copy()
    img2, anns2, meta2 = T.rescale_relative(img, anns, meta, 0.5)
    assert img2.shape == (50, 75, 3)
    img3, anns3, meta3 = T.square_pad(img2, anns2, meta2)
    assert img3.shape[0] == img3.shape[1] == 75
    rec = T.annotations_inverse(anns3, meta3)
    np.testing.assert_allclose(rec[:, :, :2], orig[:, :, :2], atol=1e-4)
    np.testing.assert_allclose(rec[:, :, 3], orig[:, :, 3], atol=1e-4)


def test_warp_affine_inverse_roundtrip(rng):
    img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    anns = np.zeros((2, 17, 4), np.float32)
    anns[:, :, 0] = 40 + rng.rand(2, 17) * 60
    anns[:, :, 1] = 30 + rng.rand(2, 17) * 50
    anns[:, :, 2] = 2
    anns[:, :, 3] = 4.0
    meta = T.make_meta(160, 120)
    orig = anns.copy()
    params = dict(flip=False, rotate=20.0, scale=1.3, x_stretch=1.02,
                  y_stretch=0.98, x_offset=5, y_offset=-7)
    img2, anns2, meta2, _ = T.warp_affine(
        img, anns, meta, None, params, 128, LEFT_INDEX, RIGHT_INDEX)
    assert img2.shape == (128, 128, 3)
    vis = anns2[:, :, 2] > 0
    rec = T.affine_keypoint_inverse(anns2, meta2)
    np.testing.assert_allclose(rec[:, :, :2][vis], orig[:, :, :2][vis],
                               atol=1e-3)
    np.testing.assert_allclose(rec[:, :, 3][vis], orig[:, :, 3][vis],
                               atol=1e-3)


def test_warp_affine_flip_swaps_channels(rng):
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    anns = np.zeros((1, 17, 4), np.float32)
    anns[0, :, 0] = np.linspace(10, 50, 17)
    anns[0, :, 1] = 32
    anns[0, :, 2] = 2
    meta = T.make_meta(64, 64)
    params = dict(T.IDENTITY_PARAMS, flip=True)
    orig = anns.copy()
    _, anns2, meta2, _ = T.warp_affine(
        img, anns, meta, None, params, 64, LEFT_INDEX, RIGHT_INDEX,
        crop_roi=False)
    # left/right channels swapped; inverse restores original channel order
    np.testing.assert_allclose(anns2[0, LEFT_INDEX, 0],
                               63 - orig[0, RIGHT_INDEX, 0], atol=1e-3)
    rec = T.affine_keypoint_inverse(anns2, meta2)
    np.testing.assert_allclose(rec[0, :, 0], orig[0, :, 0], atol=1e-3)


def test_native_rle_matches_python(rng):
    from offsetguided_tpu.data import native
    if not native.available():
        import pytest
        pytest.skip('no native toolchain')
    mask = (rng.rand(31, 19) > 0.55).astype(np.uint8)
    runs = native.rle_encode_mask(mask)
    s = rle_encode_counts(list(int(r) for r in runs))
    np.testing.assert_array_equal(
        rle_to_mask({'size': [31, 19], 'counts': s}), mask)
    # python fallback agrees
    np.testing.assert_array_equal(
        rle_to_mask({'size': [31, 19],
                     'counts': rle_decode_counts(s)}), mask)


def test_transform_combinators(rng):
    img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    anns = np.zeros((1, 17, 4), np.float32)
    anns[:, :, 2] = 2
    meta = T.make_meta(40, 40)

    def shift(image, a, m, mm):
        a = a.copy()
        a[:, :, 0] += 1
        return image, a, m, mm

    pipe = T.compose(shift, shift)
    _, a2, _, _ = pipe(img, anns, meta)
    np.testing.assert_allclose(a2[:, :, 0], anns[:, :, 0] + 2)

    always = T.random_apply(shift, 1.0, rng)
    never = T.random_apply(shift, 0.0, rng)
    _, a3, _, _ = always(img, anns, meta)
    _, a4, _, _ = never(img, anns, meta)
    assert a3[0, 0, 0] == anns[0, 0, 0] + 1
    assert a4[0, 0, 0] == anns[0, 0, 0]

    fan = T.multi_scale(pipe, always)
    outs = fan(img, anns, meta)
    assert len(outs) == 2
