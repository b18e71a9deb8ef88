"""Loss parity vs a boolean-indexing torch oracle (reference semantics)."""
import numpy as np
import torch

import jax.numpy as jnp

from offsetguided_tpu.config.defaults import LossConfig
from offsetguided_tpu.ops.encoder import Targets
from offsetguided_tpu.ops.losses import compute_losses

N, H, W, J, L = 2, 8, 8, 17, 19


def oracle(preds, tg, mask, cfg):
    """Reference-style loss computation with dynamic boolean indexing."""
    def t(x):
        return torch.from_numpy(np.asarray(x))

    def masked(pred, gt, fun):
        m = t(mask).expand_as(t(gt)) & torch.isfinite(t(gt))
        return fun(t(pred)[m], t(gt)[m])

    def focal(p, g):
        st = torch.where(g >= cfg.ftao, p, 1 - p)
        return 0.5 * (p - g) ** 2 * torch.abs(1 - st) ** cfg.fgamma

    def margin_norm(v, margin):
        v = v[v >= margin]
        if cfg.sqrt_re:
            v = torch.sqrt(v)
        return (v.sum() / (1 + v.numel())).item()

    n_stacks = len(preds['hmp'])
    w = [wi / sum(cfg.stack_weights[:n_stacks])
         for wi in cfg.stack_weights[:n_stacks]]
    out = dict(hmp=0.0, bg=0.0, jomp=0.0, omp=0.0, scmp=0.0)
    for s in range(n_stacks):
        out['hmp'] += w[s] * masked(preds['hmp'][s], tg.hmp, focal).sum().item()
        out['bg'] += w[s] * masked(preds['bg'][s], tg.bg, focal).sum().item()
        jv = masked(preds['jomp'][s], tg.jomp, lambda a, b: (a - b).abs())
        out['jomp'] += w[s] * margin_norm(jv, cfg.offset_margin)
        # instance-normalized offset L1
        m = t(mask).expand_as(t(tg.omp)) & torch.isfinite(t(tg.omp))
        pv = t(preds['omp'][s])[m] / t(tg.pscmp)[m]
        gv = t(tg.omp)[m] / t(tg.pscmp)[m]
        out['omp'] += w[s] * margin_norm((pv - gv).abs(), cfg.offset_margin)
        sv = masked(preds['scmp'][s], tg.scmp, lambda a, b: (a - b).abs())
        out['scmp'] += w[s] * margin_norm(sv, cfg.scale_margin)
    for k in out:
        out[k] /= N
    lam = cfg.lambdas
    out['total'] = (lam[0] * out['hmp'] + lam[1] * out['bg']
                    + lam[2] * out['jomp'] + lam[3] * out['omp']
                    + lam[4] * out['scmp'])
    return out


def make_data(rng):
    hmp = rng.rand(N, H, W, J).astype(np.float32)
    bg = rng.rand(N, H, W, 1).astype(np.float32)
    jomp = rng.randn(N, H, W, 2).astype(np.float32)
    jomp[:, :3] = np.inf  # unlabeled region
    omp = rng.randn(N, H, W, 2 * L).astype(np.float32)
    omp[:, :, :2] = np.inf
    scmp = (rng.rand(N, H, W, J) * 8).astype(np.float32)
    scmp[:, 4:] = np.nan
    pscmp = (0.5 + rng.rand(N, H, W, 2 * L) * 4).astype(np.float32)
    tg = Targets(hmp=hmp, bg=bg, jomp=jomp, omp=omp, scmp=scmp, pscmp=pscmp)
    mask = rng.rand(N, H, W, 1) > 0.2
    preds = {
        'hmp': [rng.rand(N, H, W, J).astype(np.float32) for _ in range(2)],
        'bg': [rng.rand(N, H, W, 1).astype(np.float32) for _ in range(2)],
        'jomp': [rng.randn(N, H, W, 2).astype(np.float32) for _ in range(2)],
        'omp': [rng.randn(N, H, W, 2 * L).astype(np.float32) for _ in range(2)],
        'spread': [None, None],
        'scmp': [(rng.rand(N, H, W, J) * 8).astype(np.float32) for _ in range(2)],
    }
    return preds, tg, mask


def test_losses_match_oracle(rng):
    cfg = LossConfig(fgamma=2.0, sqrt_re=True)
    preds, tg, mask = make_data(rng)
    ref = oracle(preds, tg, mask, cfg)
    jtg = Targets(*[jnp.asarray(x) for x in tg])
    jpreds = {k: [None if v is None else jnp.asarray(v) for v in vs]
              for k, vs in preds.items()}
    ours = compute_losses(jpreds, jtg, jnp.asarray(mask), cfg)
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=2e-4,
                                   err_msg=k)


def test_losses_no_sqrt(rng):
    cfg = LossConfig(fgamma=1.0, sqrt_re=False,
                     lambdas=(1.0, 1.0, 1.0, 1.0, 1.0))
    preds, tg, mask = make_data(rng)
    ref = oracle(preds, tg, mask, cfg)
    jtg = Targets(*[jnp.asarray(x) for x in tg])
    jpreds = {k: [None if v is None else jnp.asarray(v) for v in vs]
              for k, vs in preds.items()}
    ours = compute_losses(jpreds, jtg, jnp.asarray(mask), cfg)
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=2e-4,
                                   err_msg=k)


def test_losses_all_masked(rng):
    cfg = LossConfig()
    preds, tg, mask = make_data(rng)
    mask = np.zeros_like(mask)
    jtg = Targets(*[jnp.asarray(x) for x in tg])
    jpreds = {k: [None if v is None else jnp.asarray(v) for v in vs]
              for k, vs in preds.items()}
    ours = compute_losses(jpreds, jtg, jnp.asarray(mask), cfg)
    assert float(ours['total']) == 0.0
