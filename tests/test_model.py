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
