"""Reverse-converter test: flax -> reference-format torch state_dict.

Validates `export_torch_state_dict` / `save_torch_checkpoint` three ways:
1. the exported key set loads into the torch replica of the reference module
   tree (tests/test_converter_numeric.py) with strict=True — key-complete in
   both directions;
2. the torch replica's forward matches our flax forward on the exported
   weights (numerical inverse of the t2f oracle test);
3. exporting then re-importing through `convert_torch_state_dict` reproduces
   the original variables bit-for-bit.

Reference format: models/networks.py:126-144 ({epoch, train_loss,
model_state_dict}); module tree models/networks.py:176-194.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from offsetguided_tpu.models import PoseNet, checkpoint as C
from test_checkpoint import tiny_cfg
from test_converter_numeric import TNet, _nchw


def _init(seed=0):
    cfg = tiny_cfg()
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return cfg, model, variables


def test_export_loads_strict_and_matches_forward():
    cfg, model, variables = _init()
    sd = C.export_torch_state_dict(variables, cfg)

    replica = TNet(cfg)
    # strict=True: no missing, no unexpected keys in either direction
    replica.load_state_dict({k: torch.tensor(np.asarray(v))
                             for k, v in sd.items()}, strict=True)

    rng = np.random.RandomState(7)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    replica.eval()
    with torch.no_grad():
        t_out = replica(_nchw(x))
    j_out = model.apply(variables, jnp.asarray(x), train=False)
    for key in ('hmp', 'bg', 'jomp', 'omp', 'scmp'):
        for s in range(cfg.n_stacks):
            ours = np.asarray(j_out[key][s])
            ref = np.transpose(t_out[key][s].numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4,
                                       err_msg=f'{key} stack {s}')


def test_export_import_roundtrip_bit_exact():
    cfg, model, variables = _init(seed=3)
    sd = C.export_torch_state_dict(variables, cfg)
    restored, missing = C.convert_torch_state_dict(sd, variables, cfg)
    assert not missing, missing[:10]
    orig_p = C._flatten(jax.tree_util.tree_map(np.asarray,
                                               variables['params']))
    back_p = C._flatten(jax.tree_util.tree_map(np.asarray,
                                               restored['params']))
    assert set(orig_p) == set(back_p)
    for k in orig_p:
        np.testing.assert_array_equal(orig_p[k], back_p[k], err_msg=k)
    orig_s = C._flatten(jax.tree_util.tree_map(np.asarray,
                                               variables['batch_stats']))
    back_s = C._flatten(jax.tree_util.tree_map(np.asarray,
                                               restored['batch_stats']))
    for k in orig_s:
        np.testing.assert_array_equal(orig_s[k], back_s[k], err_msg=k)


def test_save_torch_checkpoint_file_roundtrip(tmp_path):
    cfg, model, variables = _init(seed=5)
    path = str(tmp_path / 'exported.pth')
    C.save_torch_checkpoint(path, variables, cfg, epoch=12, train_loss=3.25)
    blob = torch.load(path, map_location='cpu', weights_only=False)
    assert blob['epoch'] == 12 and blob['train_loss'] == 3.25
    # loads back through the forward converter entry point
    restored, missing = C.load_torch_checkpoint(path, variables, cfg)
    assert not missing, missing[:10]
    a = C._flatten(jax.tree_util.tree_map(np.asarray, variables['params']))
    b = C._flatten(jax.tree_util.tree_map(np.asarray, restored['params']))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_export_rejects_unmapped_basenet():
    from offsetguided_tpu.config.defaults import ModelConfig
    cfg = ModelConfig(basenet='hourglass4stage', n_stacks=1, hg_order=2,
                      dims=(8, 8, 12), modules=(1, 1, 1), cnv_dim=8,
                      compute_dtype='float32')
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError):
        C.export_torch_state_dict(variables, cfg)
