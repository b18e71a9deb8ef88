"""PoseNet: backbone + heads composition (reference models/networks.py:176-225).

`PoseNet.__call__` returns the heads' dict of per-stack NHWC prediction maps.
The module is a pure function of (params, batch_stats); training state lives in
`parallel/train_step.py`.
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
from flax import linen as nn

from ..config.defaults import ModelConfig
from .heads import PoseHeads
from .hourglass104 import Hourglass104
from .hourglass4stage import Hourglass4Stage


def basenet_factory(cfg: ModelConfig) -> nn.Module:
    """Select a backbone (reference models/networks.py:197-225, but the
    4-stage net is actually buildable here)."""
    if cfg.basenet == 'hourglass104':
        return Hourglass104(cfg)
    if cfg.basenet == 'hourglass52':
        # single-stack hourglass (reference networks.py:212-215)
        import dataclasses as _dc
        return Hourglass104(_dc.replace(cfg, n_stacks=1))
    if cfg.basenet == 'hourglass4stage':
        return Hourglass4Stage(cfg)
    raise ValueError(f'unknown basenet: {cfg.basenet}')


class PoseNet(nn.Module):
    """Full network: image -> per-stack prediction maps."""
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False
                 ) -> Dict[str, List[jnp.ndarray]]:
        feats = basenet_factory(self.cfg)(image, train)
        return PoseHeads(self.cfg.heads,
                         dtype=jnp.dtype(self.cfg.compute_dtype),
                         param_dtype=jnp.dtype(self.cfg.param_dtype))(feats)


def create_model_state(rng, cfg: ModelConfig, input_shape=(1, 512, 512, 3)):
    """Initialize (params, batch_stats) pytrees."""
    model = PoseNet(cfg)
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                           train=False)
    return model, variables


def count_params(tree) -> int:
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
