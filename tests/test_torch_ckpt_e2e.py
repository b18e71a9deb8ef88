"""End-to-end reference-checkpoint loading: a REAL torch-saved .pth file
(checkpoint dict wrapping, module. prefixes, torch.load) driven through
tools/evaluate.py --torch-checkpoint.

This closes the last untested link of the published-weights path: the
converter itself is numerically validated in test_converter_numeric.py, but
`load_torch_checkpoint` (file I/O + {model_state_dict, ...} unwrapping, the
format reference networks.py:126-144 writes) had no test with an actual
torch-serialized file.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from offsetguided_tpu.config.defaults import HeadsConfig, ModelConfig
from offsetguided_tpu.models import PoseNet, checkpoint as C
from test_converter_numeric import TNet, _nchw


def eval_tiny_cfg():
    """EXACTLY tools/evaluate.py --debug-tiny-model."""
    return ModelConfig(n_stacks=1, hg_order=2, dims=(8, 8, 12),
                       modules=(1, 1, 1), cnv_dim=8,
                       compute_dtype='float32', heads=HeadsConfig())


@pytest.fixture(scope='module')
def pth_file(tmp_path_factory):
    torch.manual_seed(0)
    replica = TNet(eval_tiny_cfg())
    # sane running stats (fresh BN has var=1, mean=0 -- fine) and the
    # reference's checkpoint dict shape, with DDP 'module.' prefixes
    sd = {f'module.{k}': v for k, v in replica.state_dict().items()
          if not k.endswith('num_batches_tracked')}
    path = tmp_path_factory.mktemp('pth') / 'PoseNet_77_epoch.pth'
    torch.save({'epoch': 77, 'train_loss': 0.123,
                'model_state_dict': sd}, str(path))
    return str(path), replica


def test_load_torch_checkpoint_numerical(pth_file):
    """torch.load + unwrap + convert reproduces the torch forward."""
    path, replica = pth_file
    cfg = eval_tiny_cfg()
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    converted, missing = C.load_torch_checkpoint(path, variables, cfg)
    assert not missing, missing[:10]

    rng = np.random.RandomState(3)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    replica.eval()
    with torch.no_grad():
        t_out = replica(_nchw(x))
    j_out = model.apply(converted, jnp.asarray(x), train=False)
    for key in ('hmp', 'omp'):
        ours = np.asarray(j_out[key][-1])
        ref = np.transpose(t_out[key][-1].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4,
                                   err_msg=key)


def test_evaluate_cli_with_pth(pth_file, tmp_path):
    """The full tool: .pth -> convert -> forward -> decode -> AP + results."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'tools'))
    from selfcheck import make_dataset
    import pathlib
    img_dir_root = tmp_path / 'ds'
    make_dataset(pathlib.Path(img_dir_root), n_images=2)
    from evaluate import main as eval_main

    path, _ = pth_file
    results_json = str(tmp_path / 'results.json')
    eval_main(['--image-dir', str(img_dir_root / 'images'),
               '--annotation-file', str(img_dir_root / 'annotations.json'),
               '--torch-checkpoint', path, '--debug-tiny-model',
               '--long-edge', '256', '--batch-size', '2',
               '--results-json', results_json])
    results = json.load(open(results_json))
    assert isinstance(results, list) and results
    for r in results:
        assert 'image_id' in r and len(r['keypoints']) == 51


def test_backbone_only_pretrain_partial_load(tmp_path):
    """Reference-style backbone pretrain (README.md:160 --basenet-checkpoint):
    bare 'pre./kps.' keys, no headnets. Backbone weights load, heads keep
    their fresh init, and the gaps are reported -- the strict=False rescue
    semantics of reference networks.py:74-96."""
    torch.manual_seed(1)
    cfg = eval_tiny_cfg()
    replica = TNet(cfg)
    bare = {k[len('basenet.'):]: v
            for k, v in replica.state_dict().items()
            if k.startswith('basenet.')
            and not k.endswith('num_batches_tracked')}
    path = str(tmp_path / 'hourglass_backbone.pth')
    torch.save(bare, path)

    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    converted, missing = C.load_torch_checkpoint(path, variables, cfg)
    # all gaps are head keys, none are backbone keys
    assert missing and all('headnets.' in m for m in missing), missing[:5]

    before = C._flatten(jax.tree_util.tree_map(np.asarray,
                                               variables['params']))
    after = C._flatten(jax.tree_util.tree_map(np.asarray,
                                              converted['params']))
    for k in after:
        if 'PoseHeads_0' in k:
            np.testing.assert_array_equal(after[k], before[k])  # fresh init
    stem = after['Hourglass104_0/ConvBN_0/Conv_0/kernel']
    ref = np.transpose(bare['pre.0.conv.weight'].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(stem, ref)


def test_train_tool_torch_warm_start(tmp_path):
    """tools/train.py --torch-checkpoint runs optimizer steps from the
    converted warm start."""
    import pathlib
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'tools'))
    from selfcheck import make_dataset
    from train import main as train_main

    root = tmp_path / 'ds'
    make_dataset(pathlib.Path(root), n_images=2)
    torch.manual_seed(2)
    # the train tool's --debug-tiny-model config
    cfg = ModelConfig(basenet='hourglass104', n_stacks=1, hg_order=2,
                      dims=(16, 16, 24), modules=(1, 1, 1), cnv_dim=16,
                      compute_dtype='float32', heads=HeadsConfig())
    replica = TNet(cfg)
    path = str(tmp_path / 'warm.pth')
    torch.save({'model_state_dict': replica.state_dict()}, path)
    train_main(['--train-image-dir', str(root / 'images'),
                '--train-annotations', str(root / 'annotations.json'),
                '--square-length', '64', '--max-persons', '4',
                '--debug-tiny-model', '--n-stacks', '1',
                '--batch-size', '2', '--max-steps', '2', '--print-freq', '1',
                '--torch-checkpoint', path,
                '--checkpoint-dir', str(tmp_path / 'ckpts')])
    assert os.path.isdir(tmp_path / 'ckpts')
