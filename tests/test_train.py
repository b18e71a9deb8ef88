"""Training step: loss decreases on a fixed batch; sharded mesh execution."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from offsetguided_tpu.config import COCO_PERSON_SIGMAS, COCO_PERSON_SKELETON
from offsetguided_tpu.config.defaults import (EncoderConfig, HeadsConfig,
                                              LossConfig, ModelConfig,
                                              TrainConfig)
from offsetguided_tpu.models import PoseNet
from offsetguided_tpu.ops.encoder import encode_targets
from offsetguided_tpu.parallel import (batch_sharding, create_train_state,
                                       make_mesh, make_optimizer,
                                       make_train_step, replicated)


def tiny_model():
    cfg = ModelConfig(n_stacks=1, hg_order=2, dims=(16, 16, 24),
                      modules=(1, 1, 1), cnv_dim=16, compute_dtype='float32',
                      heads=HeadsConfig())
    return cfg, PoseNet(cfg)


def synth_batch(rng, batch=2, size=64):
    anns = np.zeros((batch, 4, 17, 4), np.float32)
    anns[:, :2, :, 0] = rng.rand(batch, 2, 17) * size
    anns[:, :2, :, 1] = rng.rand(batch, 2, 17) * size
    anns[:, :2, :, 2] = 2.0
    anns[:, :2, :, 3] = 5.0
    images = rng.rand(batch, size, size, 3).astype(np.float32)
    enc = EncoderConfig(max_persons=4)
    targets = encode_targets(jnp.asarray(anns), np.asarray(COCO_PERSON_SIGMAS),
                             COCO_PERSON_SKELETON, size // 4, size // 4, enc)
    mask = jnp.ones((batch, size // 4, size // 4, 1), bool)
    return jnp.asarray(images), targets, mask


def test_loss_decreases(rng):
    cfg, model = tiny_model()
    images, targets, mask = synth_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    loss_cfg = LossConfig(stack_weights=(1.0,), fgamma=2.0)
    tx = make_optimizer(TrainConfig(learning_rate=3e-4))
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, loss_cfg))
    first = None
    for i in range(30):
        state, metrics = step(state, images, targets, mask)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(first['total']) and np.isfinite(last['total'])
    # heatmap loss (unit lambda) must fall fast; the 10000x-weighted offset
    # L1 moves slowly on random targets, so the total only falls modestly
    assert last['hmp'] < 0.7 * first['hmp'], (first, last)
    assert last['total'] < first['total']
    assert float(metrics['skipped']) == 0.0
    assert int(state.step) == 30


def test_explosion_guard_skips(rng):
    cfg, model = tiny_model()
    images, targets, mask = synth_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    loss_cfg = LossConfig(stack_weights=(1.0,),
                          lambdas=(1e30, 0.0, 0.0, 1e30, 1e30))
    tx = make_optimizer(TrainConfig(learning_rate=3e-4))
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, loss_cfg))
    before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = step(state, images, targets, mask)
    assert float(metrics['skipped']) == 1.0
    after = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_sharded_train_step_runs(rng):
    n_dev = jax.device_count()
    if n_dev < 2:
        pytest.skip('needs multi-device host platform')
    mesh = make_mesh(n_dev, 1)
    cfg, model = tiny_model()
    images, targets, mask = synth_batch(rng, batch=n_dev, size=32)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    loss_cfg = LossConfig(stack_weights=(1.0,))
    tx = make_optimizer(TrainConfig(learning_rate=3e-4))
    state = create_train_state(variables, tx)
    state = jax.device_put(state, replicated(mesh))
    bsh = batch_sharding(mesh)
    images = jax.device_put(images, bsh)
    targets = jax.device_put(targets, bsh)
    mask = jax.device_put(mask, bsh)
    step = jax.jit(make_train_step(model, tx, loss_cfg))
    with mesh:
        state, metrics = step(state, images, targets, mask)
    assert np.isfinite(float(metrics['total']))
    assert int(state.step) == 1


def test_sharded_inference_decode(rng):
    """Forward+decode under shard_map over the data axis (multi-chip eval)."""
    n_dev = jax.device_count()
    if n_dev < 2:
        pytest.skip('needs multi-device host platform')
    from offsetguided_tpu.config.defaults import DecoderConfig
    from offsetguided_tpu.decoder import PostProcessor
    from offsetguided_tpu.eval.harness import make_infer_fn
    from offsetguided_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(n_dev, 1)
    cfg, model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    pp = PostProcessor(cfg=DecoderConfig(topk=4, max_poses=4))
    infer = make_infer_fn(model, variables, pp, flip_test=False, mesh=mesh)
    images = jax.device_put(
        jnp.asarray(rng.rand(n_dev * 2, 32, 32, 3).astype(np.float32)),
        batch_sharding(mesh))
    with mesh:
        poses, scores, counts = infer(images)
    assert poses.shape == (n_dev * 2, 4, 17, 6)
    # shard-independent decode == single-device decode
    single = make_infer_fn(model, variables, pp, flip_test=False)
    p2, s2, c2 = single(jax.device_put(images, jax.devices()[0]))
    np.testing.assert_allclose(np.asarray(poses), np.asarray(p2), atol=1e-4)


def test_donated_train_step(rng):
    """jit_train_step donates the TrainState: the old state's buffers are
    aliased into the new state (in-place optimizer update, no
    double-buffering) and training proceeds identically across steps."""
    from offsetguided_tpu.parallel import jit_train_step

    cfg, model = tiny_model()
    images, targets, mask = synth_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    loss_cfg = LossConfig(stack_weights=(1.0,), fgamma=2.0)
    tx = make_optimizer(TrainConfig(learning_rate=3e-4))
    state = create_train_state(variables, tx)
    step = jit_train_step(model, tx, loss_cfg)

    old_leaf = jax.tree_util.tree_leaves(state.params)[0]
    state, metrics = step(state, images, targets, mask)
    # donation honored (CPU and TPU both alias same-shape state buffers)
    assert old_leaf.is_deleted()
    # the donated chain keeps stepping and stays finite
    for _ in range(2):
        state, metrics = step(state, images, targets, mask)
    assert np.isfinite(float(metrics['total']))
    assert int(state.step) == 3


def test_lowp_adam_fp32_state_matches_optax_adam(rng):
    """_scale_by_adam_lowp with float32 state == optax.adam step for step:
    the reformulated fp32-roundtrip update must not change the math."""
    import optax
    from offsetguided_tpu.parallel.train_step import _scale_by_adam_lowp

    params = {'a': jnp.asarray(rng.randn(4, 3), jnp.float32),
              'b': jnp.asarray(rng.randn(7), jnp.float32)}
    ref = optax.adam(1e-3)
    got = optax.chain(_scale_by_adam_lowp(state_dtype=jnp.float32),
                      optax.scale_by_learning_rate(1e-3))
    s_ref, s_got = ref.init(params), got.init(params)
    p_ref, p_got = params, params
    for i in range(5):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_got, s_got = got.update(g, s_got, p_got)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_got = optax.apply_updates(p_got, u_got)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_bf16_opt_state_trains(rng):
    """opt_state_dtype='bfloat16' stores bf16 moments, halving optimizer
    HBM, and the loss still decreases on a fixed batch."""
    from offsetguided_tpu.parallel import make_train_step

    cfg, model = tiny_model()
    images, targets, mask = synth_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    loss_cfg = LossConfig(stack_weights=(1.0,), fgamma=2.0)
    tx = make_optimizer(TrainConfig(learning_rate=3e-4,
                                    opt_state_dtype='bfloat16'))
    state = create_train_state(variables, tx)
    mu_leaves = jax.tree_util.tree_leaves(state.opt_state[0].mu)
    assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
    step = jax.jit(make_train_step(model, tx, loss_cfg))
    losses = []
    for _ in range(8):
        state, metrics = step(state, images, targets, mask)
        losses.append(float(metrics['total']))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)
    nu_leaves = jax.tree_util.tree_leaves(state.opt_state[0].nu)
    assert all(l.dtype == jnp.bfloat16 for l in nu_leaves)
