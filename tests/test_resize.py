"""Parity of our phase-table upsampling vs torch.nn.functional.interpolate."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from offsetguided_tpu.ops.resize import upsample2d, upsample_axis


@pytest.mark.parametrize('method', ['bicubic', 'bilinear'])
@pytest.mark.parametrize('factor', [2, 4])
def test_upsample_matches_torch(rng, method, factor):
    x = rng.randn(2, 9, 11, 5).astype(np.float32)  # NHWC
    ours = np.asarray(upsample2d(jnp.asarray(x), factor, method))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    ref = F.interpolate(xt, scale_factor=factor, mode=method,
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_upsample_nearest_shape(rng):
    x = rng.randn(1, 4, 4, 3).astype(np.float32)
    out = upsample2d(jnp.asarray(x), 4, 'nearest')
    assert out.shape == (1, 16, 16, 3)
    # nearest with half-pixel centers for integer factor = pure repeat
    np.testing.assert_array_equal(np.asarray(out), np.repeat(np.repeat(x, 4, 1), 4, 2))


def test_upsample_axis_identity(rng):
    x = rng.randn(3, 5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(upsample_axis(jnp.asarray(x), 0, 1, 'bicubic')), x)


@pytest.mark.parametrize('method', ['bicubic', 'bilinear'])
def test_upsample_matmul_matches_phase_table(rng, method):
    from offsetguided_tpu.ops.resize import upsample2d_matmul
    x = rng.randn(2, 9, 11, 5).astype(np.float32)
    a = np.asarray(upsample2d(jnp.asarray(x), 4, method))
    b = np.asarray(upsample2d_matmul(jnp.asarray(x), 4, method))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
