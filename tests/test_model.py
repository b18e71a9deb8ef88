"""Model construction, shapes, parameter count, and train/eval mode checks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from offsetguided_tpu.config.defaults import HeadsConfig, ModelConfig
from offsetguided_tpu.models import (PoseNet, count_params, create_model_state)


def small_cfg(**kw):
    # tiny hourglass for fast CPU tests: order 2, small dims
    base = dict(basenet='hourglass104', n_stacks=2, hg_order=2,
                dims=(16, 16, 24), modules=(1, 1, 1), cnv_dim=16,
                heads=HeadsConfig(), compute_dtype='float32')
    base.update(kw)
    return ModelConfig(**base)


def test_forward_shapes():
    cfg = small_cfg()
    model, variables = create_model_state(jax.random.PRNGKey(0), cfg,
                                          (1, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert len(out['hmp']) == 2
    for s in range(2):
        assert out['hmp'][s].shape == (2, 16, 16, 17)
        assert out['bg'][s].shape == (2, 16, 16, 1)
        assert out['jomp'][s].shape == (2, 16, 16, 2)
        assert out['omp'][s].shape == (2, 16, 16, 38)
        assert out['scmp'][s].shape == (2, 16, 16, 17)
        assert out['spread'][s] is None
        assert out['hmp'][s].dtype == jnp.float32


def test_train_mode_updates_batch_stats():
    cfg = small_cfg()
    model, variables = create_model_state(jax.random.PRNGKey(0), cfg,
                                          (1, 32, 32, 3))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out, mutated = model.apply(variables, x, train=True,
                               mutable=['batch_stats'])
    before = jax.tree_util.tree_leaves(variables['batch_stats'])
    after = jax.tree_util.tree_leaves(mutated['batch_stats'])
    changed = any(not np.allclose(a, b) for a, b in zip(before, after))
    assert changed


def test_hourglass104_param_count_matches_reference():
    """Backbone must weigh in at the published 187.7M params
    (reference models/hourglass_104.py:430-433)."""
    from offsetguided_tpu.models import Hourglass104
    cfg = ModelConfig()
    model = Hourglass104(cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False))
    n = count_params(variables['params'])
    assert abs(n - 187.7e6) / 187.7e6 < 0.01, n


def test_hourglass4stage_builds():
    cfg = ModelConfig(basenet='hourglass4stage', n_stacks=2,
                      compute_dtype='float32')
    model, variables = create_model_state(jax.random.PRNGKey(0), cfg,
                                          (1, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out['hmp'][0].shape == (1, 16, 16, 17)
    assert len(out['hmp']) == 2


def test_bf16_compute_fp32_params():
    cfg = small_cfg(compute_dtype='bfloat16')
    model, variables = create_model_state(jax.random.PRNGKey(0), cfg,
                                          (1, 32, 32, 3))
    leaves = jax.tree_util.tree_leaves(variables['params'])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out['hmp'][0].dtype == jnp.float32  # heads cast back to fp32


def test_tower_heads():
    from offsetguided_tpu.config.defaults import HeadsConfig
    cfg = small_cfg(heads=HeadsConfig(tower=True, tower_dim=16))
    model, variables = create_model_state(jax.random.PRNGKey(0), cfg,
                                          (1, 32, 32, 3))
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out['hmp'][0].shape == (1, 8, 8, 17)


def test_hourglass52_single_stack():
    cfg = small_cfg(basenet='hourglass52')
    model, variables = create_model_state(jax.random.PRNGKey(0), cfg,
                                          (1, 32, 32, 3))
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    # single-stack backbone: heads still follow cfg.n_stacks? heads apply per
    # backbone stack output, which is 1 for hourglass52
    assert len(out['hmp']) == 1


def test_s2d_conv_matches_dense():
    """Space-to-depth execution of the 7x7 s2 stem conv is exactly the same
    linear map as the dense conv (kernel re-indexing, fp32)."""
    from offsetguided_tpu.models.layers import Conv
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    kw = dict(features=16, kernel_size=(7, 7), strides=(2, 2),
              use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32)
    dense = Conv(s2d=False, **kw)
    s2d = Conv(s2d=True, **kw)
    variables = dense.init(jax.random.PRNGKey(0), x)
    y0 = dense.apply(variables, x)
    y1 = s2d.apply(variables, x)
    assert y0.shape == y1.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)


def test_batchnorm_matches_flax():
    """Custom BatchNorm reproduces flax nn.BatchNorm bit-for-bit: params,
    batch_stats naming, train statistics/updates and eval normalization."""
    from flax import linen as nn
    from offsetguided_tpu.models.layers import BatchNorm

    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.randn(4, 8, 8, 6) * 3 + 1).astype(np.float32))
    ours = BatchNorm(6, momentum=0.9)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       dtype=jnp.float32)
    v0 = ours.init(jax.random.PRNGKey(0), x, train=False)
    vr = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(vr)

    # seed non-trivial affine + running stats
    v = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape) + 0.5, a.dtype), v0)
    y_t, mut = ours.apply(v, x, train=True, mutable=['batch_stats'])
    yr_t, mutr = ref.apply(v, x, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(yr_t), atol=1e-5)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(mut['batch_stats'][k]),
            np.asarray(mutr['batch_stats'][k]), atol=1e-5)

    y_e = ours.apply(v, x, train=False)
    yr_e = nn.BatchNorm(use_running_average=True, momentum=0.9,
                        dtype=jnp.float32).apply(v, x)
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(yr_e), atol=1e-5)


def test_folded_bn_eval_matches_unfolded():
    """Eval-time BN folding in ConvBN/BasicResidual equals explicit conv+BN
    (fp32; in bf16 deployments the fold is the numerically better path)."""
    from flax import linen as nn
    from offsetguided_tpu.models.layers import BasicResidual, BatchNorm, Conv, ConvBN

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))

    block = ConvBN(12, kernel=3, dtype=jnp.float32, param_dtype=jnp.float32)
    v = block.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN state
    v = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5), v)
    folded = block.apply(v, x, train=False)

    conv = Conv(12, (3, 3), use_bias=False, dtype=jnp.float32,
                param_dtype=jnp.float32)
    y = conv.apply({'params': v['params']['Conv_0']}, x)
    bn = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)
    y = bn.apply({'params': v['params']['BatchNorm_0'],
                  'batch_stats': v['batch_stats']['BatchNorm_0']}, y)
    manual = nn.relu(y)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(manual),
                               rtol=2e-4, atol=1e-5)

    res = BasicResidual(12, stride=2, dtype=jnp.float32,
                        param_dtype=jnp.float32)
    vr = res.init(jax.random.PRNGKey(1), x, train=False)
    vr = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5), vr)
    out_fold = res.apply(vr, x, train=False)
    assert out_fold.shape == (2, 8, 8, 12)
    assert np.all(np.isfinite(np.asarray(out_fold)))


@pytest.mark.parametrize('basenet', ['hourglass104', 'hourglass4stage'])
def test_remat_same_params_and_grads(basenet):
    """cfg.remat recomputes stack activations in the backward: the param
    tree layout must be IDENTICAL (checkpoints interchangeable) and the
    gradients must match the stored-activation path."""
    if basenet == 'hourglass104':
        cfg = small_cfg()
        cfg_r = small_cfg(remat=True)
    else:
        cfg = ModelConfig(basenet='hourglass4stage', n_stacks=2,
                          compute_dtype='float32')
        cfg_r = ModelConfig(basenet='hourglass4stage', n_stacks=2,
                            compute_dtype='float32', remat=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    _, v = create_model_state(jax.random.PRNGKey(0), cfg, (1, 64, 64, 3))
    _, v_r = create_model_state(jax.random.PRNGKey(0), cfg_r, (1, 64, 64, 3))
    paths = jax.tree_util.tree_structure(v)
    assert paths == jax.tree_util.tree_structure(v_r)

    def loss(variables, model_cfg):
        model = PoseNet(model_cfg)
        out, _ = model.apply(variables, x, train=True,
                             mutable=['batch_stats'])
        return sum(jnp.sum(m.astype(jnp.float32) ** 2)
                   for maps in out.values() if maps is not None
                   for m in maps if m is not None)

    l1, g1 = jax.value_and_grad(loss)(v, cfg)
    l2, g2 = jax.value_and_grad(loss)(v_r, cfg_r)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        # recompute reassociates float reductions; only noise-level drift
        # (atol scaled to the leaf's magnitude: tiny elements of huge-norm
        # gradient leaves carry proportionally large reassociation noise)
        a, b = np.asarray(a), np.asarray(b)
        atol = 1e-5 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=atol)
