"""Production-width sharded lowering + execution checks.

The multi-chip dryrun executes a NARROW hourglass; channel-parallel edge
cases (divisibility of every real width by the model axis, sharding-spec
propagation through the full recursion) only appear at production widths.
`test_fullwidth_train_step_lowers_on_4x2_mesh` lowers -- does NOT compile or
run -- the full-width Hourglass-104 training step over the virtual 8-device
(data=4, model=2) mesh using abstract `ShapeDtypeStruct` arguments, so the
187.7M-param model costs tracing time only.

`test_fullwidth_train_step_executes_on_4x2_mesh` (RUN_SLOW=1, ~minutes of
CPU compile) goes further and EXECUTES one step at the minimum spatial size
(128^2, the max-stride floor):
runtime-only failure modes -- collective layouts, donation aliasing under
sharding -- are exercised at the full 187.7M parameters (VERDICT round-3
item 4; the behavior replaced is /root/reference/train_dist.py:239's DDP).
Run once per round: `RUN_SLOW=1 pytest tests/test_fullwidth_lowering.py -k
executes`; wall time is recorded in BENCHMARKS.md.
"""
import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from offsetguided_tpu.config.defaults import LossConfig, ModelConfig, TrainConfig
from offsetguided_tpu.models import PoseNet
from offsetguided_tpu.ops.encoder import Targets
from offsetguided_tpu.parallel import (batch_sharding, create_train_state,
                                       make_mesh, make_optimizer,
                                       make_train_step, param_sharding,
                                       replicated)


def _with_sharding(struct_tree, sharding_tree):
    return jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        struct_tree, sharding_tree)


def test_fullwidth_train_step_lowers_on_4x2_mesh():
    assert jax.device_count() >= 8
    mesh = make_mesh(4, 2)

    cfg = ModelConfig()                      # PRODUCTION widths (..., 512)
    model = PoseNet(cfg)
    batch, hw = 8, 128
    out_hw = hw // 4
    J, L = cfg.heads.n_keypoints, cfg.heads.n_limbs

    img_s = jax.ShapeDtypeStruct((batch, hw, hw, 3), jnp.float32)
    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jax.ShapeDtypeStruct((1, hw, hw, 3),
                                                     jnp.float32))
    tx = make_optimizer(TrainConfig(learning_rate=1e-4))
    state_shapes = jax.eval_shape(lambda v: create_train_state(v, tx),
                                  var_shapes)

    # the production sharding rules from parallel/mesh.py
    p_shard = param_sharding(state_shapes.params, mesh)
    o_shard = jax.tree_util.tree_map(
        lambda leaf: (param_sharding(leaf, mesh)
                      if hasattr(leaf, 'ndim') else replicated(mesh)),
        state_shapes.opt_state, is_leaf=lambda x: hasattr(x, 'ndim'))
    state_s = state_shapes._replace(
        params=_with_sharding(state_shapes.params, p_shard),
        batch_stats=jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=replicated(mesh)),
            state_shapes.batch_stats),
        opt_state=jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            state_shapes.opt_state, o_shard),
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=replicated(mesh)))

    bsh = batch_sharding(mesh)

    def b(c, dtype=jnp.float32):
        return jax.ShapeDtypeStruct((batch, out_hw, out_hw, c), dtype,
                                    sharding=bsh)

    targets_s = Targets(hmp=b(J), bg=b(1), jomp=b(2), omp=b(2 * L),
                        scmp=b(J), pscmp=b(2 * L))
    mask_s = b(1, jnp.bool_)
    img_s = jax.ShapeDtypeStruct(img_s.shape, img_s.dtype, sharding=bsh)

    train_step = make_train_step(model, tx, LossConfig())
    with mesh:
        lowered = jax.jit(train_step).lower(state_s, img_s, targets_s, mask_s)
    # successful lowering is the assertion: every sharding spec was accepted
    # and the StableHLO module was built at production widths
    assert lowered.in_tree is not None


@pytest.mark.skipif(os.environ.get('RUN_SLOW') != '1',
                    reason='full-width compile+execute takes minutes of CPU; '
                           'run once per round with RUN_SLOW=1')
def test_fullwidth_train_step_executes_on_4x2_mesh():
    """One REAL sharded step at 187.7M params (minimum 128^2 spatial input)."""
    assert jax.device_count() >= 8
    mesh = make_mesh(4, 2)

    cfg = ModelConfig()                      # PRODUCTION widths (..., 512)
    model = PoseNet(cfg)
    batch, hw = 8, 128
    out_hw = hw // 4
    J, L = cfg.heads.n_keypoints, cfg.heads.n_limbs

    rng = np.random.RandomState(0)
    t0 = time.time()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, hw, hw, 3), jnp.float32))
    tx = make_optimizer(TrainConfig(learning_rate=1e-4))
    state = create_train_state(variables, tx)
    t_init = time.time() - t0

    # production shardings (same rules the train CLI applies)
    p_shard = param_sharding(state.params, mesh)
    state = state._replace(
        params=jax.device_put(state.params, p_shard),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_state=jax.tree_util.tree_map(
            lambda leaf: jax.device_put(
                leaf, param_sharding(leaf, mesh)
                if hasattr(leaf, 'ndim') else replicated(mesh)),
            state.opt_state, is_leaf=lambda x: hasattr(x, 'ndim')),
        step=jax.device_put(state.step, replicated(mesh)))

    bsh = batch_sharding(mesh)
    images = jax.device_put(
        rng.randint(0, 255, (batch, hw, hw, 3)).astype(np.uint8), bsh)

    def b(c, dtype=np.float32):
        return jax.device_put(
            rng.rand(batch, out_hw, out_hw, c).astype(dtype), bsh)

    targets = Targets(hmp=b(J), bg=b(1), jomp=b(2), omp=b(2 * L),
                      scmp=b(J), pscmp=b(2 * L))
    mask = jax.device_put(
        np.ones((batch, out_hw, out_hw, 1), dtype=bool), bsh)

    train_step = jax.jit(make_train_step(model, tx, LossConfig()),
                         donate_argnums=(0,))
    t1 = time.time()
    with mesh:
        new_state, metrics = train_step(state, images, targets, mask)
        total = float(metrics['total'])
        # a second step through the SAME compiled executable exercises
        # donation aliasing with the sharded buffers as inputs
        new_state, metrics2 = train_step(new_state, images, targets, mask)
        total2 = float(metrics2['total'])
    t_run = time.time() - t1

    assert np.isfinite(total) and total > 0
    assert np.isfinite(total2)
    assert int(new_state.step) == 2
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(new_state.params))
    assert n_params > 180_000_000           # full width, not a narrow stand-in
    print(f'\nfull-width sharded execute: init {t_init:.1f}s, '
          f'compile+2 steps {t_run:.1f}s, loss {total:.4f} -> {total2:.4f}')


@pytest.mark.skipif(os.environ.get('RUN_SLOW') != '1',
                    reason='full-width compile+execute takes minutes of CPU; '
                           'run once per round with RUN_SLOW=1')
def test_fullwidth_sharded_inference_executes_on_8dev_mesh():
    """Full-width forward + FULL on-device decode under shard_map (VERDICT
    round-4 item 5): the train step has an executed full-width twin, this is
    the inference one. 187.7M params replicated, batch sharded over 8
    devices, decode (peaks -> limbs -> grouping -> flip-free postprocess)
    running per shard inside the same program — the behavior replaced is
    /root/reference/evaluate.py:211-222 + the host worker pool at
    decoder/factory.py:92-94."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8, 1)

    from offsetguided_tpu.config.defaults import DecoderConfig
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.harness import make_infer_fn

    cfg = ModelConfig()                      # PRODUCTION widths (..., 512)
    model = PoseNet(cfg)
    batch, hw = 8, 128
    J = cfg.heads.n_keypoints

    t0 = time.time()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, hw, hw, 3), jnp.float32))
    t_init = time.time() - t0
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables['params']))
    assert n_params > 180_000_000           # full width, not a narrow stand-in

    variables = jax.device_put(variables, replicated(mesh))
    bsh = batch_sharding(mesh)
    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 255, (batch, hw, hw, 3)).astype(np.uint8), bsh)

    # production decoder defaults (topk 32): the real eval program, not a toy
    pp = PostProcessor(cfg=DecoderConfig())
    infer = make_infer_fn(model, variables, pp, flip_test=False, mesh=mesh)
    t1 = time.time()
    with mesh:
        poses, scores, counts = infer(images)
        jax.block_until_ready(poses)
    t_run = time.time() - t1

    # decode output really is batch-sharded over all 8 devices (one image
    # per device), not gathered to one chip
    assert len(poses.sharding.device_set) == 8
    poses = np.asarray(poses)
    counts = np.asarray(counts)
    assert poses.shape[0] == batch and poses.shape[2:] == (J, 6)
    assert np.all(np.isfinite(poses)) and np.all(np.isfinite(np.asarray(scores)))
    assert counts.shape == (batch,) and np.all(counts >= 0)
    print(f'\nfull-width sharded inference: init {t_init:.1f}s, '
          f'compile+decode {t_run:.1f}s, counts {counts.tolist()}')
