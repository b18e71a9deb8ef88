"""Training losses: focal-L2 heatmaps, masked L1 offset/scale regression.

Parity with reference models/losses.py. The reference filters labels with
boolean indexing (`pred[mask_miss][isfinite]`, losses.py:39-58) which is
dynamic-shape; here every loss is computed as masked elementwise arithmetic
over the full fixed-shape maps -- identical sums, XLA-friendly. GT sentinel
semantics carry over: +inf/NaN targets (unlabeled texels) are excluded by the
isfinite mask.

All per-element "margin" filters (losses.py:185-188, 238-250) and the
`sum/(1+numel)` normalizations use the number of *kept* elements, exactly as
the reference.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config.defaults import LossConfig


def _l1(pred, gt):
    return jnp.abs(pred - gt)


def _l2(pred, gt):
    return 0.5 * (pred - gt) ** 2


def _focal_l2(pred, gt, tau, gamma):
    """Focal L2 (reference losses.py:31-36)."""
    st = jnp.where(gt >= tau, pred, 1.0 - pred)
    factor = jnp.abs(1.0 - st) ** gamma
    return 0.5 * (pred - gt) ** 2 * factor


def _valid_mask(gt, mask_miss):
    """mask_miss broadcast & isfinite(gt) (reference losses.py:39-58)."""
    return mask_miss & jnp.isfinite(gt)


def _masked_sum(pred, gt, mask_miss, fun):
    """sum of fun(pred, gt) over labeled texels."""
    valid = _valid_mask(gt, mask_miss)
    gt_safe = jnp.where(valid, gt, 0.0)
    elems = fun(pred, gt_safe)
    return jnp.sum(jnp.where(valid, elems, 0.0))


def _margin_normalized_sum(elems, valid, margin, sqrt_re):
    """Keep elements >= margin, optional sqrt, sum/(1+count)
    (reference losses.py:183-189, 237-242)."""
    keep = valid & (elems >= margin)
    if sqrt_re:
        # sqrt only where kept: d/dx sqrt(x) at x->0 is inf, and masked-out
        # zeros would still poison gradients through where() otherwise
        vals = jnp.sqrt(jnp.where(keep, elems, 1.0))
    else:
        vals = elems
    total = jnp.sum(jnp.where(keep, vals, 0.0))
    count = jnp.sum(keep)
    return total / (1.0 + count.astype(total.dtype))


def heatmap_loss_fn(name: str, cfg: LossConfig):
    if name == 'l2':
        return _l2
    if name == 'focal_l2':
        return lambda p, g: _focal_l2(p, g, cfg.ftao, cfg.fgamma)
    raise ValueError(f'unknown heatmap loss: {name}')


def offset_elems(name: str, pred, gt_off, gt_ps, spread, mask_miss):
    """Per-element offset loss + validity mask.

    Variants mirror reference losses.py:81-138. Returns (elems, valid).
    """
    if name == 'offset_l1':
        valid = _valid_mask(gt_off, mask_miss)
        gt_safe = jnp.where(valid, gt_off, 0.0)
        return _l1(pred, gt_safe), valid
    if name == 'offset_instance_l1':
        valid = _valid_mask(gt_off, mask_miss)
        gt_safe = jnp.where(valid, gt_off, 0.0)
        ps = jnp.where(valid, gt_ps, 1.0)
        return _l1(pred / ps, gt_safe / ps), valid
    if name == 'offset_laplace':
        # vector-norm laplace over (x, y) pairs with inferred log-spread b
        n, h, w, c2 = pred.shape
        d = (pred - jnp.where(jnp.isfinite(gt_off), gt_off, 0.0)
             ).reshape(n, h, w, c2 // 2, 2)
        norm = jnp.linalg.norm(d, axis=-1)
        valid = (_valid_mask(gt_off, mask_miss)
                 .reshape(n, h, w, c2 // 2, 2).all(axis=-1))
        elems = spread + norm * jnp.exp(-spread)
        return elems, valid
    raise ValueError(f'unknown offset loss: {name}')


def compute_losses(preds: Dict[str, List], targets, mask_miss,
                   cfg: LossConfig) -> Dict[str, jax.Array]:
    """All loss components, stack-weighted and batch-normalized.

    Args:
        preds: PoseNet output dict of per-stack NHWC maps.
        targets: ops.encoder.Targets (batched).
        mask_miss: (N, Ho, Wo, 1) bool.
    Returns:
        dict with keys hmp, bg, jomp, omp, scmp (missing heads -> 0.0) and
        'total' = lambda-weighted sum; every entry is a scalar.
    """
    n_stacks = len(preds['hmp'])
    w = [wi / sum(cfg.stack_weights[:n_stacks])
         for wi in cfg.stack_weights[:n_stacks]]
    batch = targets.hmp.shape[0]
    hmp_fn = heatmap_loss_fn(cfg.heatmap_loss, cfg)

    out = {k: 0.0 for k in ('hmp', 'bg', 'jomp', 'omp', 'scmp')}
    for s in range(n_stacks):
        out['hmp'] += w[s] * _masked_sum(preds['hmp'][s], targets.hmp,
                                         mask_miss, hmp_fn)
        if preds['bg'][s] is not None:
            out['bg'] += w[s] * _masked_sum(preds['bg'][s], targets.bg,
                                            mask_miss, hmp_fn)
        if preds['jomp'][s] is not None:
            elems, valid = offset_elems(cfg.jitter_loss, preds['jomp'][s],
                                        targets.jomp, None, None, mask_miss)
            out['jomp'] += w[s] * _margin_normalized_sum(
                elems, valid, cfg.offset_margin, cfg.sqrt_re)
        elems, valid = offset_elems(
            cfg.offset_loss, preds['omp'][s], targets.omp, targets.pscmp,
            preds['spread'][s], mask_miss)
        out['omp'] += w[s] * _margin_normalized_sum(
            elems, valid, cfg.offset_margin, cfg.sqrt_re)
        if preds['scmp'][s] is not None:
            valid = _valid_mask(targets.scmp, mask_miss)
            gt_safe = jnp.where(valid, targets.scmp, 0.0)
            elems = _l1(preds['scmp'][s], gt_safe)
            out['scmp'] += w[s] * _margin_normalized_sum(
                elems, valid, cfg.scale_margin, cfg.sqrt_re)

    for k in out:
        out[k] = out[k] / batch
    lam = cfg.lambdas
    out['total'] = (lam[0] * out['hmp'] + lam[1] * out['bg']
                    + lam[2] * out['jomp'] + lam[3] * out['omp']
                    + lam[4] * out['scmp'])
    return out
