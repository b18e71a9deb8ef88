"""Sharded training step: loss, gradients, optimizer, BN-stat update.

Replaces the reference's training inner loop (train_dist.py:275-387): apex AMP
becomes the model's bf16 compute policy (no loss scaling needed for bf16),
apex DDP's allreduce becomes XLA collectives inserted by jit over the mesh,
FusedAdam becomes optax.adam (fused under XLA), and the loss-explosion rescue
(train_dist.py:322-325) becomes a gradient gate.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.defaults import LossConfig, TrainConfig
from ..ops.encoder import Targets
from ..ops.image import normalize_images
from ..ops.losses import compute_losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _scale_by_adam_lowp(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8,
                        state_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """Adam moment update with the m/v state STORED in `state_dtype`.

    The update itself runs in fp32 (moments are upcast, new moments are
    computed, the step is taken, then both are cast back down), so the only
    precision loss is the storage rounding of m and v between steps. At
    Hourglass-104 scale the fp32 moments are 2x187.7M x 4 B = 1.5 GB of HBM
    and the optimizer's measured per-step traffic sits at its bandwidth
    floor (BENCHMARKS.md) -- bf16 halves both. Uses optax's ScaleByAdamState
    so checkpoints keep the standard adam state tree structure.
    """
    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=state_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf

        def step(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            upd = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return upd.astype(g.dtype), m32.astype(state_dtype), \
                v32.astype(state_dtype)

        out = jax.tree_util.tree_map(step, updates, state.mu, state.nu)
        leaf = lambda t: isinstance(t, tuple)
        pick = lambda i: jax.tree_util.tree_map(lambda t: t[i], out,
                                                is_leaf=leaf)
        return pick(0), optax.ScaleByAdamState(count=count, mu=pick(1),
                                               nu=pick(2))

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig, lr_schedule=None) -> optax.GradientTransformation:
    lr = lr_schedule if lr_schedule is not None else cfg.learning_rate
    if cfg.optimizer == 'adam':
        state_dtype = cfg.opt_state_dtype
        if state_dtype != 'float32':
            tx = optax.chain(
                _scale_by_adam_lowp(state_dtype=jnp.dtype(state_dtype)),
                optax.scale_by_learning_rate(lr))
        else:
            tx = optax.adam(lr)
    elif cfg.optimizer == 'sgd':
        tx = optax.sgd(lr, momentum=cfg.momentum)
    else:
        raise ValueError(cfg.optimizer)
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def create_train_state(variables, tx) -> TrainState:
    return TrainState(params=variables['params'],
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(variables['params']),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model, tx, loss_cfg: LossConfig,
                    explosion_guard: float = 1e8):
    """Returns a jittable train_step(state, images, targets, mask) function."""

    def loss_fn(params, batch_stats, images, targets, mask):
        # images arrive uint8 over the wire (data/pipeline.py); normalize
        # on device inside the step's program
        out, mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            normalize_images(images), train=True, mutable=['batch_stats'])
        losses = compute_losses(out, targets, mask, loss_cfg)
        return losses['total'], (losses, mutated['batch_stats'])

    def train_step(state: TrainState, images: jax.Array, targets: Targets,
                   mask: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, targets, mask)
        # loss-explosion rescue: drop the batch (train_dist.py:322-325)
        ok = jnp.isfinite(total) & (total < explosion_guard)
        scale = jnp.where(ok, 1.0, 0.0)
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        metrics = dict(losses)
        metrics['skipped'] = 1.0 - scale
        return new_state, metrics

    return train_step


def jit_train_step(model, tx, loss_cfg: LossConfig,
                   explosion_guard: float = 1e8):
    """jitted train step with the TrainState donated.

    Donating argument 0 aliases the old params/opt-state/BN buffers to the
    new state's outputs, so the ~3x-params fp32 optimizer state is updated
    in place instead of double-buffered — at Hourglass-104 scale (187.7M
    params) that returns ~2.2 GB of HBM to activations/batch. Callers must
    rebind `state` from the return value (all in-repo loops do).
    """
    return jax.jit(make_train_step(model, tx, loss_cfg, explosion_guard),
                   donate_argnums=(0,))


def make_eval_step(model, loss_cfg: LossConfig):
    """Validation loss step (reference test(), train_dist.py:390-455)."""

    def eval_step(state: TrainState, images, targets, mask):
        out = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            normalize_images(images), train=False)
        return compute_losses(out, targets, mask, loss_cfg)

    return eval_step


def cyclic_lr_schedule(cfg: TrainConfig, steps_per_epoch: int,
                       cycle_epochs: int = 10, min_factor: float = 0.1):
    """SWA-style cyclic schedule (reference utils/util.py:63-71
    adjust_learning_rate_cyclic): LR decays linearly within each cycle."""
    base = cfg.learning_rate

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        t = jnp.mod(epoch, cycle_epochs) / cycle_epochs
        return base * (1.0 - (1.0 - min_factor) * t)

    return schedule


def step_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Reference hand-tuned schedule: optional warmup then step drops at
    fixed epochs (utils/util.py:27-60)."""
    base = cfg.learning_rate

    def schedule(step):
        epoch = step / steps_per_epoch
        lr = jnp.full_like(jnp.asarray(step, jnp.float32), base)
        if cfg.warmup_epochs:
            warm = base * (jnp.asarray(step, jnp.float32) + 1) / (
                cfg.warmup_epochs * steps_per_epoch)
            lr = jnp.where(epoch < cfg.warmup_epochs, warm, lr)
        factor = jnp.ones_like(lr)
        for e in cfg.lr_drop_epochs:
            factor = jnp.where(epoch >= e, factor * cfg.lr_drop_factor, factor)
        return lr * factor

    return schedule
