"""Checkpointing: orbax save/restore with the reference's partial-restore
options, plus a PyTorch state_dict converter for the published weights.

Reference counterpart: models/networks.py:12-144 (`load_model`/`save_model`)
and the resume flags of train_dist.py:48-63 (--recount-epoch,
--drop-optim-state, --drop-layers, --freeze).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import ModelConfig
from ..parallel.train_step import TrainState


# --------------------------------------------------------------------------- #
# orbax-based native checkpoints
# --------------------------------------------------------------------------- #

def _ckpt_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f'posenet_{epoch:03d}')


_async_ckptr = None


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    train_loss: float = float('inf'), *,
                    blocking: bool = True) -> str:
    """Save {params, batch_stats, opt_state, step} + metadata
    (reference save_model, networks.py:126-144).

    With ``blocking=False`` the device->host copy still happens inside this
    call (so the arrays may be donated/updated immediately after), but the
    disk write runs on a background thread and overlaps training — call
    `wait_for_saves()` before process exit. At most one save is in flight;
    a second non-blocking save first drains the previous one.
    """
    import orbax.checkpoint as ocp
    path = _ckpt_path(ckpt_dir, epoch)
    payload = {
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
        'step': state.step,
        'meta': {'epoch': epoch, 'train_loss': train_loss},
    }
    if blocking:
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
    else:
        global _async_ckptr
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        _async_ckptr.wait_until_finished()
        _async_ckptr.save(path, payload, force=True)
    return path


def wait_for_saves() -> None:
    """Drain any in-flight non-blocking `save_checkpoint` write."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = sorted(p for p in os.listdir(ckpt_dir)
                   if re.match(r'posenet_\d+$', p))
    return os.path.join(os.path.abspath(ckpt_dir), cands[-1]) if cands else None


def load_checkpoint(path: str, state: TrainState, *,
                    drop_optimizer: bool = False,
                    drop_layers: Optional[str] = None,
                    recount_epoch: bool = False
                    ) -> Tuple[TrainState, int, float]:
    """Restore with partial-resume options (reference networks.py:12-123).

    drop_layers: regex over parameter paths; matching parameters keep their
    freshly initialized values (the reference's offset_convs drop for
    head-swap experiments).
    """
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    # restore against a structure template so tuples (optax states) keep
    # their exact pytree structure
    template = {
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
        'step': state.step,
        'meta': {'epoch': 0, 'train_loss': 0.0},
    }
    try:
        restored = ckptr.restore(path, item=template)
    except (TypeError, ValueError):
        restored = ckptr.restore(path)

    params = _merge_matching(state.params, restored.get('params', {}),
                             drop_layers)
    batch_stats = _merge_matching(state.batch_stats,
                                  restored.get('batch_stats', {}), drop_layers)
    if drop_optimizer:
        opt_state, step = state.opt_state, state.step
    else:
        restored_opt = restored.get('opt_state', state.opt_state)
        if jax.tree_util.tree_structure(restored_opt, is_leaf=None) == \
                jax.tree_util.tree_structure(state.opt_state):
            opt_state = jax.tree_util.tree_map(jnp.asarray, restored_opt)
        else:
            opt_state = state.opt_state  # structure drift: keep fresh
        step = jnp.asarray(restored.get('step', state.step))

    meta = restored.get('meta', {})
    epoch = 0 if recount_epoch else int(meta.get('epoch', 0))
    loss = float(meta.get('train_loss', float('inf')))
    return (TrainState(params=params, batch_stats=batch_stats,
                       opt_state=opt_state, step=step), epoch, loss)


def _merge_matching(template, restored, drop_regex: Optional[str]):
    """Copy restored leaves whose path doesn't match drop_regex and whose
    shape matches (shape-mismatch rescue, networks.py:75-86)."""
    pat = re.compile(drop_regex) if drop_regex else None
    flat_t = _flatten(template)
    flat_r = _flatten(restored)
    out = {}
    for k, v in flat_t.items():
        r = flat_r.get(k)
        if (r is not None and (pat is None or not pat.search(k))
                and tuple(np.shape(r)) == tuple(np.shape(v))):
            out[k] = jnp.asarray(r)
        else:
            out[k] = v
    return _unflatten(out)


def _flatten(tree, prefix='') -> Dict[str, Any]:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}/'))
        return out
    return {prefix[:-1]: tree}


def _unflatten(flat: Dict[str, Any]):
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        keys = path.split('/')
        d = out
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = v
    return out


def freeze_mask(params, freeze_regex: str):
    """optax mask tree: True where trainable (reference --freeze backbone,
    train_dist.py:203-206)."""
    pat = re.compile(freeze_regex)
    flat = _flatten(params)
    mask = {k: not bool(pat.search(k)) for k in flat}
    return _unflatten(mask)


# --------------------------------------------------------------------------- #
# PyTorch checkpoint conversion (published reference weights)
# --------------------------------------------------------------------------- #

def _torch_hourglass_names(cfg: ModelConfig) -> List[Tuple[str, str, str]]:
    """(flax_path_in_backbone, torch_prefix, kind) pairs in construction order.

    kind: 'convbn' (conv+bn), 'conv' (bias conv), 'residual'.
    Torch module layout per reference models/hourglass_104.py:193-298 wrapped
    as `basenet.` by NetworkWrapper (models/networks.py:176-194).
    """
    pairs: List[Tuple[str, str, str]] = []
    pairs.append(('ConvBN_0', 'basenet.pre.0', 'convbn'))
    pairs.append(('BasicResidual_0', 'basenet.pre.1', 'residual'))

    conv_i, res_i = 1, 1

    def kp_pairs(flax_prefix: str, torch_prefix: str, n: int, dims, modules):
        nonlocal pairs
        curr_mod = modules[0]
        next_mod = modules[1]
        r = 0
        for m in range(curr_mod):
            pairs.append((f'{flax_prefix}/BasicResidual_{r}',
                          f'{torch_prefix}.up1.{m}', 'residual'))
            r += 1
        for m in range(curr_mod):
            pairs.append((f'{flax_prefix}/BasicResidual_{r}',
                          f'{torch_prefix}.low1.{m}', 'residual'))
            r += 1
        if n > 1:
            kp_pairs(f'{flax_prefix}/KPModule_0', f'{torch_prefix}.low2',
                     n - 1, dims[1:], modules[1:])
        else:
            for m in range(next_mod):
                pairs.append((f'{flax_prefix}/BasicResidual_{r}',
                              f'{torch_prefix}.low2.{m}', 'residual'))
                r += 1
        for m in range(curr_mod - 1):
            pairs.append((f'{flax_prefix}/BasicResidual_{r}',
                          f'{torch_prefix}.low3.{m}', 'residual'))
            r += 1
        pairs.append((f'{flax_prefix}/BasicResidual_{r}',
                      f'{torch_prefix}.low3.{curr_mod - 1}', 'residual'))

    for s in range(cfg.n_stacks):
        kp_pairs(f'KPModule_{s}', f'basenet.kps.{s}', cfg.hg_order,
                 tuple(cfg.dims), tuple(cfg.modules))
        pairs.append((f'ConvBN_{conv_i}', f'basenet.cnvs.{s}', 'convbn'))
        conv_i += 1
        if s < cfg.n_stacks - 1:
            pairs.append((f'ConvBN_{conv_i}', f'basenet.inters_.{s}',
                          'convbn_seq'))
            conv_i += 1
            pairs.append((f'ConvBN_{conv_i}', f'basenet.cnvs_.{s}',
                          'convbn_seq'))
            conv_i += 1
            pairs.append((f'BasicResidual_{res_i}', f'basenet.inters.{s}',
                          'residual'))
            res_i += 1
    return pairs


def _head_names(cfg: ModelConfig) -> List[Tuple[str, str]]:
    """Head 1x1 convs: our heads dict vs reference headnets
    (models/heads.py:32-46, 95-114). headnets[0]=HeatMapsHead,
    headnets[1]=OffsetMapsHead."""
    h = cfg.heads
    pairs = []
    for s in range(cfg.n_stacks):
        pairs.append((f'hmp_{s}', f'headnets.0.hp_convs.{s}'))
        if h.include_background:
            pairs.append((f'bg_{s}', f'headnets.0.bghp_convs.{s}'))
        if h.include_jitter_offset:
            pairs.append((f'jomp_{s}', f'headnets.0.jitter_convs.{s}'))
        pairs.append((f'omp_{s}', f'headnets.1.reg_convs.{s}'))
        if h.include_spread:
            pairs.append((f'spread_{s}', f'headnets.1.spread_convs.{s}'))
        if h.include_scale:
            pairs.append((f'scmp_{s}', f'headnets.1.scale_convs.{s}'))
    return pairs


def _t2f_conv(w) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             variables: Dict, cfg: ModelConfig) -> Dict:
    """Reference PyTorch state_dict -> flax variables {params, batch_stats}.

    `state_dict` values may be numpy arrays or torch tensors. Module-prefix
    'module.' is stripped (apex DDP artifacts, networks.py:62-69).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k[7:] if k.startswith('module.') and \
            not k.startswith('module_list') else k
        sd[k] = np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, 'detach') else v)
    # bare-backbone checkpoints (the pretrained hourglass_104 file the
    # reference warm-starts from, README.md:160 --basenet-checkpoint) carry
    # keys without the NetworkWrapper's 'basenet.' prefix
    if (not any(k.startswith('basenet.') for k in sd)
            and any(k.startswith(('pre.', 'kps.')) for k in sd)):
        sd = {f'basenet.{k}': v for k, v in sd.items()}

    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])
    params = _flatten(params)
    stats = _flatten(stats)
    missing: List[str] = []

    def put(fk: str, value, collection):
        if value is None:
            return              # absent torch key: keep the fresh init
        if fk in collection:
            if tuple(collection[fk].shape) == tuple(value.shape):
                collection[fk] = value.astype(collection[fk].dtype)
            else:
                missing.append(f'shape mismatch {fk}: {collection[fk].shape} '
                               f'vs {value.shape}')
        else:
            missing.append(f'no flax param {fk}')

    def get(tk: str):
        """Partial checkpoints (backbone-only pretrain) simply lack keys;
        mirror the reference's strict=False rescue (networks.py:92-96): the
        fresh initialization stays, and the gap is reported."""
        if tk in sd:
            return sd[tk]
        missing.append(f'no torch key {tk}')
        return None

    def conv(value):
        return None if value is None else _t2f_conv(value)

    def load_convbn(flax_prefix, torch_prefix, seq=False):
        conv_t = f'{torch_prefix}.0' if seq else f'{torch_prefix}.conv'
        bn_t = f'{torch_prefix}.1' if seq else f'{torch_prefix}.bn'
        put(f'{flax_prefix}/Conv_0/kernel', conv(get(f'{conv_t}.weight')),
            params)
        if f'{conv_t}.bias' in sd:
            put(f'{flax_prefix}/Conv_0/bias', sd[f'{conv_t}.bias'], params)
        put(f'{flax_prefix}/BatchNorm_0/scale', get(f'{bn_t}.weight'), params)
        put(f'{flax_prefix}/BatchNorm_0/bias', get(f'{bn_t}.bias'), params)
        put(f'{flax_prefix}/BatchNorm_0/mean', get(f'{bn_t}.running_mean'),
            stats)
        put(f'{flax_prefix}/BatchNorm_0/var', get(f'{bn_t}.running_var'),
            stats)

    def load_residual(flax_prefix, torch_prefix):
        names = [('conv1', 'bn1', 'Conv_0', 'BatchNorm_0'),
                 ('conv2', 'bn2', 'Conv_1', 'BatchNorm_1')]
        for conv_t, bn_t, conv_f, bn_f in names:
            put(f'{flax_prefix}/{conv_f}/kernel',
                conv(get(f'{torch_prefix}.{conv_t}.weight')), params)
            put(f'{flax_prefix}/{bn_f}/scale',
                get(f'{torch_prefix}.{bn_t}.weight'), params)
            put(f'{flax_prefix}/{bn_f}/bias',
                get(f'{torch_prefix}.{bn_t}.bias'), params)
            put(f'{flax_prefix}/{bn_f}/mean',
                get(f'{torch_prefix}.{bn_t}.running_mean'), stats)
            put(f'{flax_prefix}/{bn_f}/var',
                get(f'{torch_prefix}.{bn_t}.running_var'), stats)
        if f'{torch_prefix}.skip.0.weight' in sd:
            put(f'{flax_prefix}/Conv_2/kernel',
                _t2f_conv(sd[f'{torch_prefix}.skip.0.weight']), params)
            put(f'{flax_prefix}/BatchNorm_2/scale',
                sd[f'{torch_prefix}.skip.1.weight'], params)
            put(f'{flax_prefix}/BatchNorm_2/bias',
                sd[f'{torch_prefix}.skip.1.bias'], params)
            put(f'{flax_prefix}/BatchNorm_2/mean',
                sd[f'{torch_prefix}.skip.1.running_mean'], stats)
            put(f'{flax_prefix}/BatchNorm_2/var',
                sd[f'{torch_prefix}.skip.1.running_var'], stats)

    bb = 'Hourglass104_0'
    for flax_path, torch_prefix, kind in _torch_hourglass_names(cfg):
        fp = f'{bb}/{flax_path}'
        if kind == 'convbn':
            load_convbn(fp, torch_prefix)
        elif kind == 'convbn_seq':
            load_convbn(fp, torch_prefix, seq=True)
        else:
            load_residual(fp, torch_prefix)

    hp = 'PoseHeads_0'
    for flax_name, torch_prefix in _head_names(cfg):
        put(f'{hp}/{flax_name}/kernel', conv(get(f'{torch_prefix}.weight')),
            params)
        put(f'{hp}/{flax_name}/bias', get(f'{torch_prefix}.bias'), params)

    # a bare-backbone pretrain file is EXPECTED to lack head keys; a
    # full-network checkpoint missing BACKBONE keys is a truncated/corrupt
    # file and would silently evaluate with partially random weights
    bb_missing = [m for m in missing
                  if m.startswith('no torch key basenet.')]
    if bb_missing:
        import logging as _logging
        _logging.getLogger(__name__).warning(
            'torch checkpoint is missing %d BACKBONE keys (e.g. %s) - the '
            'converted model keeps fresh-random weights there. This is NOT '
            'the expected backbone-only warm-start case; the file is likely '
            'truncated or from a different architecture.',
            len(bb_missing), bb_missing[:3])

    converted = {
        'params': jax.tree_util.tree_map(
            jnp.asarray, _unflatten(params)),
        'batch_stats': jax.tree_util.tree_map(
            jnp.asarray, _unflatten(stats)),
    }
    return converted, missing


def _f2t_conv(w) -> np.ndarray:
    """flax HWIO -> torch OIHW."""
    return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))


def export_torch_state_dict(variables: Dict,
                            cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Flax variables {params, batch_stats} -> reference-style state_dict.

    Exact inverse of `convert_torch_state_dict`: key names and OIHW layout
    follow the reference NetworkWrapper module tree (models/networks.py:
    176-194 `basenet.`/`headnets.` split, models/hourglass_104.py:193-298,
    models/heads.py:10-142), so the result loads into the reference
    framework with `strict=True` — a model trained here can be evaluated or
    fine-tuned there. BatchNorm `num_batches_tracked` counters (which the
    reference's own saved files carry) are emitted as 0.
    """
    if cfg.basenet != 'hourglass104':
        raise ValueError(
            f'torch export is defined for the reference Hourglass-104 module '
            f'tree only, not basenet={cfg.basenet!r}')
    params = _flatten(jax.tree_util.tree_map(np.asarray, variables['params']))
    stats = _flatten(jax.tree_util.tree_map(np.asarray,
                                            variables['batch_stats']))
    sd: Dict[str, np.ndarray] = {}

    def f32(v):
        return np.asarray(v, np.float32)

    def put_bn(flax_prefix, bn_f, torch_prefix):
        sd[f'{torch_prefix}.weight'] = f32(params[f'{flax_prefix}/{bn_f}/scale'])
        sd[f'{torch_prefix}.bias'] = f32(params[f'{flax_prefix}/{bn_f}/bias'])
        sd[f'{torch_prefix}.running_mean'] = f32(
            stats[f'{flax_prefix}/{bn_f}/mean'])
        sd[f'{torch_prefix}.running_var'] = f32(
            stats[f'{flax_prefix}/{bn_f}/var'])
        sd[f'{torch_prefix}.num_batches_tracked'] = np.asarray(0, np.int64)

    bb = 'Hourglass104_0'
    for flax_path, torch_prefix, kind in _torch_hourglass_names(cfg):
        fp = f'{bb}/{flax_path}'
        if kind in ('convbn', 'convbn_seq'):
            seq = kind == 'convbn_seq'
            conv_t = f'{torch_prefix}.0' if seq else f'{torch_prefix}.conv'
            bn_t = f'{torch_prefix}.1' if seq else f'{torch_prefix}.bn'
            sd[f'{conv_t}.weight'] = _f2t_conv(params[f'{fp}/Conv_0/kernel'])
            if f'{fp}/Conv_0/bias' in params:
                sd[f'{conv_t}.bias'] = f32(params[f'{fp}/Conv_0/bias'])
            put_bn(fp, 'BatchNorm_0', bn_t)
        else:
            sd[f'{torch_prefix}.conv1.weight'] = _f2t_conv(
                params[f'{fp}/Conv_0/kernel'])
            put_bn(fp, 'BatchNorm_0', f'{torch_prefix}.bn1')
            sd[f'{torch_prefix}.conv2.weight'] = _f2t_conv(
                params[f'{fp}/Conv_1/kernel'])
            put_bn(fp, 'BatchNorm_1', f'{torch_prefix}.bn2')
            if f'{fp}/Conv_2/kernel' in params:
                sd[f'{torch_prefix}.skip.0.weight'] = _f2t_conv(
                    params[f'{fp}/Conv_2/kernel'])
                put_bn(fp, 'BatchNorm_2', f'{torch_prefix}.skip.1')

    hp = 'PoseHeads_0'
    for flax_name, torch_prefix in _head_names(cfg):
        sd[f'{torch_prefix}.weight'] = _f2t_conv(
            params[f'{hp}/{flax_name}/kernel'])
        sd[f'{torch_prefix}.bias'] = f32(params[f'{hp}/{flax_name}/bias'])
    return sd


def save_torch_checkpoint(path: str, variables: Dict, cfg: ModelConfig, *,
                          epoch: int = 0,
                          train_loss: float = float('nan')) -> None:
    """Write a reference-format `.pth` file (networks.py:126-144 dict layout:
    {epoch, train_loss, model_state_dict}) loadable by the reference's
    `load_model` and by `load_torch_checkpoint` here."""
    import torch
    # copy=True: jax-backed arrays are read-only views torch can't wrap
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_torch_state_dict(variables, cfg).items()}
    torch.save({'epoch': epoch, 'train_loss': train_loss,
                'model_state_dict': sd}, path)


def inverse_torch_names(variables: Dict, cfg: ModelConfig) -> Dict[str, tuple]:
    """flax path -> expected torch key + shape; used for mapping validation."""
    out = {}
    flat = _flatten(jax.tree_util.tree_map(np.shape, variables['params']))
    for flax_path, torch_prefix, kind in _torch_hourglass_names(cfg):
        out[f'Hourglass104_0/{flax_path}'] = (torch_prefix, kind)
    return out


def load_torch_checkpoint(path: str, variables: Dict, cfg: ModelConfig):
    """Load a reference .pth checkpoint file and convert."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model_state_dict', ckpt.get('state_dict', ckpt))
    return convert_torch_state_dict(sd, variables, cfg)
