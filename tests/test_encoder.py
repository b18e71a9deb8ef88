"""GT encoder parity vs a windowed NumPy oracle (reference semantics)."""
import math

import numpy as np
import cv2
import jax.numpy as jnp

from offsetguided_tpu.config import (COCO_PERSON_SKELETON, COCO_PERSON_SIGMAS)
from offsetguided_tpu.config.defaults import EncoderConfig
from offsetguided_tpu.ops.encoder import encode_targets, downscale_mask

SK = COCO_PERSON_SKELETON
J, L = 17, len(SK)


def oracle_encode(anns, out_h, out_w, cfg):
    """Windowed loop implementation following encoder/{heatmap,offset}.py."""
    s = cfg.stride
    gx = np.arange(out_w) * s + s / 2 - 0.5
    gy = np.arange(out_h) * s + s / 2 - 0.5
    dsig2 = 2 * cfg.sigma ** 2
    gsize = 2 * math.ceil(math.sqrt(-dsig2 * math.log(cfg.gaussian_clip)) / s)

    hmp = np.zeros((out_h, out_w, J), np.float32)
    jomp = np.full((out_h, out_w, 2), np.inf, np.float32)
    omp = np.full((out_h, out_w, 2 * L), np.inf, np.float32)
    scmp = np.full((out_h, out_w, J), np.nan, np.float32)
    pscmp = np.full((out_h, out_w, 2 * L), 1.0, np.float32)

    def window(x, y, size):
        x_min = int(round(x / s - size / 2)); x_max = int(round(x / s + size / 2))
        y_min = int(round(y / s - size / 2)); y_max = int(round(y / s + size / 2))
        if x_max < 0 or y_max < 0:
            return None
        return slice(max(y_min, 0), y_max), slice(max(x_min, 0), x_max)

    # heatmaps + jitter: channel-major like the reference
    for j in range(J):
        for p in range(anns.shape[0]):
            x, y, v = anns[p, j, :3]
            if v <= 0:
                continue
            wnd = window(x, y, gsize)
            if wnd is None:
                continue
            sy, sx = wnd
            ex = np.exp(-(gx[sx] - x) ** 2 / dsig2)
            ey = np.exp(-(gy[sy] - y) ** 2 / dsig2)
            g = np.outer(ey, ex)
            g[g < cfg.gaussian_clip] = 0
            patch = hmp[sy, sx, j]
            hmp[sy, sx, j] = np.maximum(patch, g)

            wnd = window(x, y, cfg.fill_jitter_size)
            if wnd is None:
                continue
            sy, sx = wnd
            dx = x - gx[sx]; dy = y - gy[sy]
            mesh = np.stack(np.broadcast_arrays(dx[None, :], dy[:, None]), -1)
            n_new = np.linalg.norm(mesh, axis=-1)
            n_old = np.linalg.norm(jomp[sy, sx], axis=-1)
            m = n_new < n_old
            jomp[sy, sx][m] = mesh[m]

    # guiding offsets, limb-major
    for l, (fr, to) in enumerate(SK):
        for p in range(anns.shape[0]):
            if anns[p, fr, 2] <= 0 or anns[p, to, 2] <= 0:
                continue
            fx, fy, fscale = anns[p, fr, 0], anns[p, fr, 1], anns[p, fr, 3]
            tx, ty = anns[p, to, 0], anns[p, to, 1]
            wnd = window(fx, fy, cfg.fill_scale_size)
            if wnd is None:
                continue
            sy, sx = wnd
            dx = tx - gx[sx]; dy = ty - gy[sy]
            mesh = np.stack(np.broadcast_arrays(dx[None, :], dy[:, None]), -1)
            n_new = np.linalg.norm(mesh, axis=-1)
            n_old = np.linalg.norm(omp[sy, sx, 2 * l:2 * l + 2], axis=-1)
            m = n_new < n_old
            omp[sy, sx, 2 * l:2 * l + 2][m] = mesh[m]
            scmp[sy, sx, fr][m] = fscale if fscale >= cfg.min_jscale else np.nan
            pscmp[sy, sx, 2 * l:2 * l + 2][m] = fscale / COCO_PERSON_SIGMAS[fr]

    bg = 1 - hmp.max(-1, keepdims=True)
    return hmp, bg, jomp, omp, scmp, pscmp


def random_anns(rng, n_persons, img=64.0):
    anns = np.zeros((n_persons, J, 4), np.float32)
    anns[:, :, 0] = rng.rand(n_persons, J) * img * 1.2 - img * 0.1
    anns[:, :, 1] = rng.rand(n_persons, J) * img * 1.2 - img * 0.1
    anns[:, :, 2] = (rng.rand(n_persons, J) < 0.8) * 2.0
    anns[:, :, 3] = rng.rand(n_persons, J) * 10
    return anns


def test_encoder_matches_oracle(rng):
    cfg = EncoderConfig(stride=4, sigma=7.0, max_persons=6)
    out_h = out_w = 16
    anns = random_anns(rng, 4)
    padded = np.zeros((1, 6, J, 4), np.float32)
    padded[0, :4] = anns
    t = encode_targets(jnp.asarray(padded), np.asarray(COCO_PERSON_SIGMAS),
                       SK, out_h, out_w, cfg)
    hmp, bg, jomp, omp, scmp, pscmp = oracle_encode(anns, out_h, out_w, cfg)
    np.testing.assert_allclose(np.asarray(t.hmp[0]), hmp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.bg[0]), bg, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.jomp[0]), jomp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.omp[0]), omp, atol=1e-4)
    # scmp is order-dependent in the reference wherever fill windows of
    # different persons overlap (last limb-writer wins); require our value to
    # be one of the plausible person scales (or NaN where the oracle is NaN).
    ours_sc = np.asarray(t.scmp[0])
    assert np.array_equal(np.isnan(ours_sc), np.isnan(scmp))
    for j in range(J):
        vals = ours_sc[:, :, j][~np.isnan(ours_sc[:, :, j])]
        cand = set(np.round(anns[:, j, 3], 4)) | {np.nan}
        for v in np.unique(np.round(vals, 4)):
            assert v in cand, (j, v, cand)
    np.testing.assert_allclose(np.asarray(t.pscmp[0]), pscmp, atol=1e-4)


def test_encoder_empty_annotations():
    cfg = EncoderConfig(max_persons=4)
    padded = np.zeros((1, 4, J, 4), np.float32)
    t = encode_targets(jnp.asarray(padded), np.asarray(COCO_PERSON_SIGMAS),
                       SK, 8, 8, cfg)
    assert np.all(np.asarray(t.hmp) == 0)
    assert np.all(np.asarray(t.bg) == 1)
    assert np.all(np.isinf(np.asarray(t.omp)))
    assert np.all(np.isnan(np.asarray(t.scmp)))
    assert np.all(np.asarray(t.pscmp) == 1.0)


def test_downscale_mask_matches_cv2(rng):
    cfg = EncoderConfig(stride=4)
    m = (rng.rand(32, 32) > 0.4).astype(np.float32)
    ref = cv2.resize(m, (0, 0), fx=0.25, fy=0.25, interpolation=cv2.INTER_CUBIC)
    ref_bool = ref > cfg.mask_miss_threshold
    ours = np.asarray(downscale_mask(jnp.asarray(m[None]), cfg))[0, :, :, 0]
    # compare only away from threshold boundary to dodge float differences
    stable = np.abs(ref - cfg.mask_miss_threshold) > 1e-3
    np.testing.assert_array_equal(ours[stable], ref_bool[stable])


def test_vectorized_matches_scan_implementation(rng):
    """The default person-vectorized renderer must agree with the lax.scan
    formulation (kept as `_encode_single_scan`): selection-driven fields
    (jomp/omp/scmp/pscmp) bit-exactly — including exact-duplicate-person
    ties — and hmp/bg to 1 f32 ulp (the compiler may fuse exp(a)*exp(b)
    differently between the two programs)."""
    import functools
    import jax
    from offsetguided_tpu.ops import encoder as enc_mod

    P = 8
    cfg = EncoderConfig(max_persons=P)
    out = 48
    S = out * cfg.stride
    kw = dict(sigmas=jnp.asarray(np.asarray(COCO_PERSON_SIGMAS)),
              skeleton=tuple(map(tuple, SK)), out_h=out, out_w=out, cfg=cfg)
    vec = jax.jit(functools.partial(enc_mod._encode_single, **kw))
    scan = jax.jit(functools.partial(enc_mod._encode_single_scan, **kw))
    for trial in range(4):
        anns = np.zeros((P, J, 4), np.float32)
        npers = [0, 3, P, 5][trial]
        anns[:npers, :, 0] = rng.rand(npers, J) * S * 1.2 - S * 0.1
        anns[:npers, :, 1] = rng.rand(npers, J) * S * 1.2 - S * 0.1
        anns[:npers, :, 2] = rng.randint(0, 3, (npers, J)).astype(np.float32)
        anns[:npers, :, 3] = rng.rand(npers, J) * 30 + 0.5
        if trial == 3:
            anns[1] = anns[0]            # exact nearest-wins ties
        a, b = vec(jnp.asarray(anns)), scan(jnp.asarray(anns))
        for name in a._fields:
            x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
            assert not (np.isnan(x) ^ np.isnan(y)).any(), (trial, name)
            fin = np.isfinite(x) & np.isfinite(y)
            assert not (np.isinf(x) ^ np.isinf(y)).any(), (trial, name)
            if name in ('hmp', 'bg'):
                np.testing.assert_allclose(x[fin], y[fin], atol=1.5e-7)
            else:
                np.testing.assert_array_equal(x[fin], y[fin],
                                              err_msg=f'{trial} {name}')
