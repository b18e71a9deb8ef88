"""Device mesh construction and sharding rules.

The reference's only model of parallelism is NCCL data-parallel with apex DDP
(train_dist.py:151-154, 238-247; SURVEY.md section 2.8). The TPU-native design is a
2-axis `jax.sharding.Mesh`:

- `data`: batch sharding over ICI (gradient averaging falls out of jit's
  global-mean loss -- XLA inserts the reduce-scatter/all-reduce, replacing
  apex DDP's allreduce; BatchNorm statistics computed under jit over the
  sharded batch are likewise global, replacing apex SyncBN).
- `model`: optional channel-wise tensor parallelism for the widest conv
  layers -- kernels with >= `min_shard_channels` output channels are sharded
  on their output-channel axis, activations follow by propagation.

Multi-host extends the same mesh over DCN via `jax.distributed.initialize`;
nothing else changes.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(params, mesh: Mesh, min_shard_channels: int = 256):
    """Channel-parallel sharding rule for conv/dense kernels.

    Kernels whose output-channel (last) axis is divisible by the `model` axis
    size and at least `min_shard_channels` wide are sharded over `model`;
    everything else is replicated. With n_model == 1 this replicates all
    parameters (pure DP).
    """
    n_model = mesh.shape['model']

    def rule(leaf):
        if (n_model > 1 and hasattr(leaf, 'ndim') and leaf.ndim >= 2
                and leaf.shape[-1] >= min_shard_channels
                and leaf.shape[-1] % n_model == 0):
            spec = [None] * (leaf.ndim - 1) + ['model']
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
