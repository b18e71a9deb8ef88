"""Two-process jax.distributed smoke test for tools/train.py --distributed.

Launches the real training tool in two coordinated processes on the CPU
platform (2 virtual devices each -> a 4-device global mesh), runs two
optimizer steps on a synthetic dataset, and checks process 0 writes a
checkpoint. This is the multi-host story behind the reference's
torch.distributed.launch flow (reference README.md:160,
train_dist.py:151-154).
"""
import json
import os
import socket
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)
sys.path.insert(0, {repo!r})
from tools.train import main
main({argv!r})
print('WORKER_DONE proc', jax.process_index(),
      'devices', jax.device_count(), 'procs', jax.process_count())
"""


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('mh_data')
    img_dir = root / 'images'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for img_id in range(1, 5):
        img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        name = f'{img_id:06d}.jpg'
        cv2.imwrite(str(img_dir / name), img)
        images.append({'id': img_id, 'file_name': name,
                       'height': 96, 'width': 96})
        kps = np.zeros((17, 3), np.float32)
        kps[:, 0] = 20 + rng.rand(17) * 50
        kps[:, 1] = 20 + rng.rand(17) * 50
        kps[:, 2] = 2
        annotations.append({
            'id': img_id, 'image_id': img_id, 'category_id': 1,
            'keypoints': kps.reshape(-1).tolist(), 'num_keypoints': 17,
            'iscrowd': 0, 'bbox': [15.0, 15.0, 60.0, 60.0], 'area': 3600.0,
        })
    ann = {'images': images, 'annotations': annotations,
           'categories': [{'id': 1, 'name': 'person'}]}
    ann_file = root / 'annotations.json'
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_train_distributed_two_processes(tiny_dataset, tmp_path):
    img_dir, ann_file = tiny_dataset
    port = _free_port()
    ckpt_dir = str(tmp_path / 'ckpts')

    procs = []
    for pid in range(2):
        argv = [
            '--train-image-dir', img_dir, '--train-annotations', ann_file,
            '--square-length', '64', '--max-persons', '4',
            '--debug-tiny-model', '--n-stacks', '1',
            # device-aug: the per-sample aug-parameter arrays also ride the
            # per-process global-batch slicing (strict superset of host mode)
            '--device-aug', '--raw-canvas', '96',
            '--batch-size', '4', '--max-steps', '2', '--print-freq', '1',
            '--checkpoint-dir', ckpt_dir,
            '--distributed', '--coordinator-address', f'localhost:{port}',
            '--num-processes', '2', '--process-id', str(pid),
        ]
        code = WORKER.format(repo=REPO, argv=argv)
        env = dict(os.environ)
        env.pop('XLA_FLAGS', None)
        env.pop('JAX_PLATFORMS', None)
        procs.append(subprocess.Popen(
            [sys.executable, '-c', code], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc {pid} failed:\n{out[-4000:]}'
        assert f'WORKER_DONE proc {pid} devices 4 procs 2' in out, out[-2000:]
    # only process 0 writes the checkpoint
    assert os.path.isdir(ckpt_dir), outs[0][-2000:]
    assert any(os.scandir(ckpt_dir))
