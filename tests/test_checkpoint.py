"""Checkpoint save/restore + torch state_dict conversion mapping coverage."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from offsetguided_tpu.config.defaults import HeadsConfig, ModelConfig, TrainConfig
from offsetguided_tpu.models import PoseNet, create_model_state
from offsetguided_tpu.models import checkpoint as C
from offsetguided_tpu.parallel import (create_train_state, make_optimizer)


def tiny_cfg():
    return ModelConfig(basenet='hourglass104', n_stacks=2, hg_order=2,
                       dims=(8, 8, 12), modules=(1, 1, 1), cnv_dim=8,
                       compute_dtype='float32')


def make_state():
    cfg = tiny_cfg()
    model, variables = create_model_state(jax.random.PRNGKey(0), cfg,
                                          (1, 32, 32, 3))
    tx = make_optimizer(TrainConfig())
    return cfg, model, variables, create_train_state(variables, tx)


def synth_torch_sd(variables, cfg):
    """Generate a reference-style state_dict with random values, with key
    names and OIHW shapes derived from the documented mapping."""
    rng = np.random.RandomState(0)
    flat = C._flatten(jax.tree_util.tree_map(np.asarray, variables['params']))
    stats = C._flatten(jax.tree_util.tree_map(np.asarray,
                                              variables['batch_stats']))
    sd = {}

    def conv_entry(flax_key, torch_key, bias_key=None, bias_flax=None):
        h, w, i, o = flat[flax_key].shape
        sd[torch_key] = rng.randn(o, i, h, w).astype(np.float32)
        if bias_key and bias_flax in flat:
            sd[bias_key] = rng.randn(o).astype(np.float32)

    def bn_entry(flax_scale_key, torch_prefix):
        n = flat[flax_scale_key].shape[0]
        sd[f'{torch_prefix}.weight'] = rng.randn(n).astype(np.float32)
        sd[f'{torch_prefix}.bias'] = rng.randn(n).astype(np.float32)
        sd[f'{torch_prefix}.running_mean'] = rng.randn(n).astype(np.float32)
        sd[f'{torch_prefix}.running_var'] = np.abs(
            rng.randn(n)).astype(np.float32)

    bb = 'Hourglass104_0'
    for flax_path, torch_prefix, kind in C._torch_hourglass_names(cfg):
        fp = f'{bb}/{flax_path}'
        if kind in ('convbn', 'convbn_seq'):
            conv_t = f'{torch_prefix}.0' if kind == 'convbn_seq' \
                else f'{torch_prefix}.conv'
            bn_t = f'{torch_prefix}.1' if kind == 'convbn_seq' \
                else f'{torch_prefix}.bn'
            conv_entry(f'{fp}/Conv_0/kernel', f'{conv_t}.weight')
            bn_entry(f'{fp}/BatchNorm_0/scale', bn_t)
        else:
            conv_entry(f'{fp}/Conv_0/kernel', f'{torch_prefix}.conv1.weight')
            bn_entry(f'{fp}/BatchNorm_0/scale', f'{torch_prefix}.bn1')
            conv_entry(f'{fp}/Conv_1/kernel', f'{torch_prefix}.conv2.weight')
            bn_entry(f'{fp}/BatchNorm_1/scale', f'{torch_prefix}.bn2')
            if f'{fp}/Conv_2/kernel' in flat:
                conv_entry(f'{fp}/Conv_2/kernel',
                           f'{torch_prefix}.skip.0.weight')
                bn_entry(f'{fp}/BatchNorm_2/scale', f'{torch_prefix}.skip.1')

    hp = 'PoseHeads_0'
    for flax_name, torch_prefix in C._head_names(cfg):
        h, w, i, o = flat[f'{hp}/{flax_name}/kernel'].shape
        sd[f'{torch_prefix}.weight'] = rng.randn(o, i, h, w).astype(np.float32)
        sd[f'{torch_prefix}.bias'] = rng.randn(o).astype(np.float32)
    return sd


def test_torch_conversion_full_coverage():
    cfg, model, variables, state = make_state()
    sd = synth_torch_sd(variables, cfg)
    converted, missing = C.convert_torch_state_dict(sd, variables, cfg)
    assert not missing, missing[:10]
    # every parameter leaf must have been replaced by the synthetic values
    before = C._flatten(jax.tree_util.tree_map(np.asarray,
                                               variables['params']))
    after = C._flatten(jax.tree_util.tree_map(np.asarray,
                                              converted['params']))
    unchanged = [k for k in before
                 if np.allclose(before[k], after[k], atol=1e-12)]
    assert not unchanged, unchanged[:10]
    # conversion transposes correctly: OIHW -> HWIO for the stem conv
    stem = after['Hourglass104_0/ConvBN_0/Conv_0/kernel']
    np.testing.assert_allclose(
        stem, np.transpose(sd['basenet.pre.0.conv.weight'], (2, 3, 1, 0)))
    # forward runs with converted weights
    out = model.apply(converted, jnp.zeros((1, 32, 32, 3)), train=False)
    assert np.all(np.isfinite(np.asarray(out['hmp'][-1])))


def test_module_prefix_stripped():
    cfg, model, variables, state = make_state()
    sd = {f'module.{k}': v for k, v in synth_torch_sd(variables, cfg).items()}
    converted, missing = C.convert_torch_state_dict(sd, variables, cfg)
    assert not missing


def test_orbax_roundtrip(tmp_path):
    cfg, model, variables, state = make_state()
    path = C.save_checkpoint(str(tmp_path), state, epoch=3, train_loss=1.5)
    state2, epoch, loss = C.load_checkpoint(path, state)
    assert epoch == 3 and loss == 1.5
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_restore_drop_layers(tmp_path):
    cfg, model, variables, state = make_state()
    path = C.save_checkpoint(str(tmp_path), state, epoch=1)
    # different init to distinguish restored vs fresh leaves
    _, variables2 = create_model_state(jax.random.PRNGKey(9), cfg,
                                       (1, 32, 32, 3))
    tx = make_optimizer(TrainConfig())
    fresh = create_train_state(variables2, tx)
    state2, _, _ = C.load_checkpoint(path, fresh, drop_layers='omp_',
                                     drop_optimizer=True, recount_epoch=True)
    after = C._flatten(jax.tree_util.tree_map(np.asarray, state2.params))
    origin = C._flatten(jax.tree_util.tree_map(np.asarray, state.params))
    fresh_flat = C._flatten(jax.tree_util.tree_map(np.asarray, fresh.params))
    for k in after:
        if 'omp_' in k:
            np.testing.assert_array_equal(after[k], fresh_flat[k])
        else:
            np.testing.assert_array_equal(after[k], origin[k])


def test_freeze_mask():
    cfg, model, variables, state = make_state()
    mask = C.freeze_mask(state.params, 'Hourglass104_0')
    flat = C._flatten(mask)
    assert all(v is False for k, v in flat.items() if 'Hourglass104_0' in k)
    assert all(v is True for k, v in flat.items() if 'PoseHeads_0' in k)


def test_async_save_roundtrip_with_donation(tmp_path):
    """Non-blocking save: the device->host copy happens inside save(), so
    donating/overwriting the state right after is safe; the background disk
    write restores identically after wait_for_saves()."""
    _, _, _, state = make_state()
    snap = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    path = C.save_checkpoint(str(tmp_path), state, epoch=7, train_loss=2.0,
                             blocking=False)
    # donate the saved-from buffers immediately (what a donated train step
    # does — the old arrays are DELETED): the checkpoint must reflect the
    # values captured at save() time
    clobber = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x * 0 - 1.0, p),
        donate_argnums=0)
    state = state._replace(params=clobber(state.params))
    jax.block_until_ready(state.params)
    C.wait_for_saves()
    _, _, _, fresh = make_state()
    state2, epoch, loss = C.load_checkpoint(path, fresh)
    assert epoch == 7 and loss == 2.0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]), snap)
    # a second in-flight save drains the first (at most one outstanding)
    C.save_checkpoint(str(tmp_path), state, epoch=8, blocking=False)
    C.wait_for_saves()
    state3, epoch3, _ = C.load_checkpoint(C.latest_checkpoint(str(tmp_path)),
                                          fresh)
    assert epoch3 == 8
    assert float(jax.tree_util.tree_leaves(state3.params)[0].max()) == -1.0
