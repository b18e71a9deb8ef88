"""Numerical torch-oracle test of the checkpoint converter.

Builds a *torch* replica of the reference network structure (reference
models/hourglass_104.py:16-321, models/heads.py:10-142, wrapped as `basenet.`/
`headnets.` by models/networks.py:176-194), loads the synthesized reference
state_dict into it with strict key checking, and asserts that our flax model
with `convert_torch_state_dict` weights reproduces the torch forward
numerically. This verifies the whole key mapping, the OIHW->HWIO transpose,
BN eval semantics (incl. folded-BN inference), conv padding geometry, and the
space-to-depth stem *numerically*, not just structurally.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
tnn = torch.nn

from offsetguided_tpu.models import PoseNet, checkpoint as C
from test_checkpoint import synth_torch_sd, tiny_cfg


# --------------------------------------------------------------------------- #
# torch replica of the reference module tree (attribute names match the
# reference state_dict keys so load_state_dict validates the mapping both ways)
# --------------------------------------------------------------------------- #

class TConvBN(tnn.Module):
    def __init__(self, k, i, o, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, k, stride=stride, padding=(k - 1) // 2,
                               bias=False)
        self.bn = tnn.BatchNorm2d(o)

    def forward(self, x, relu=True):
        y = self.bn(self.conv(x))
        return torch.relu(y) if relu else y


class TRes(tnn.Module):
    def __init__(self, i, o, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(i, o, 3, stride=stride, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(o)
        self.conv2 = tnn.Conv2d(o, o, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(o)
        if stride != 1 or i != o:
            self.skip = tnn.Sequential(
                tnn.Conv2d(i, o, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(o))
        else:
            self.skip = tnn.Sequential()

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + self.skip(x))


class TKP(tnn.Module):
    """Recursive hourglass; in_dim only differs from dims[0] in tiny test
    configs (the real model has dims[0] == 256 == stem width)."""

    def __init__(self, n, dims, modules, in_dim):
        super().__init__()
        curr_dim, next_dim = dims[0], dims[1]
        curr_mod, next_mod = modules[0], modules[1]
        self.up1 = tnn.Sequential(*[
            TRes(in_dim if m == 0 else curr_dim, curr_dim)
            for m in range(curr_mod)])
        self.low1 = tnn.Sequential(*(
            [TRes(in_dim, next_dim, stride=2)] +
            [TRes(next_dim, next_dim) for _ in range(curr_mod - 1)]))
        if n > 1:
            self.low2 = TKP(n - 1, dims[1:], modules[1:], next_dim)
        else:
            self.low2 = tnn.Sequential(*[
                TRes(next_dim, next_dim) for _ in range(next_mod)])
        self.low3 = tnn.Sequential(*(
            [TRes(next_dim, next_dim) for _ in range(curr_mod - 1)] +
            [TRes(next_dim, curr_dim)]))
        self.up2 = tnn.Upsample(scale_factor=2)

    def forward(self, x):
        return self.up1(x) + self.up2(self.low3(self.low2(self.low1(x))))


class TBase(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims, modules = tuple(cfg.dims), tuple(cfg.modules)
        self.pre = tnn.Sequential(TConvBN(7, 3, 128, stride=2),
                                  TRes(128, 256, stride=2))
        self.kps = tnn.ModuleList([
            TKP(cfg.hg_order, dims, modules, 256)
            for _ in range(cfg.n_stacks)])
        self.cnvs = tnn.ModuleList([
            TConvBN(3, dims[0], cfg.cnv_dim) for _ in range(cfg.n_stacks)])
        self.inters_ = tnn.ModuleList([
            tnn.Sequential(tnn.Conv2d(256, 256, 1, bias=False),
                           tnn.BatchNorm2d(256))
            for _ in range(cfg.n_stacks - 1)])
        self.cnvs_ = tnn.ModuleList([
            tnn.Sequential(tnn.Conv2d(cfg.cnv_dim, 256, 1, bias=False),
                           tnn.BatchNorm2d(256))
            for _ in range(cfg.n_stacks - 1)])
        self.inters = tnn.ModuleList([
            TRes(256, 256) for _ in range(cfg.n_stacks - 1)])

    def forward(self, x):
        inter = self.pre(x)
        outs = []
        for s, (kp, cnv) in enumerate(zip(self.kps, self.cnvs)):
            y = cnv(kp(inter))
            outs.append(y)
            if s < len(self.kps) - 1:
                inter = torch.relu(self.inters_[s](inter) + self.cnvs_[s](y))
                inter = self.inters[s](inter)
        return outs


class THeads0(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        h, c = cfg.heads, cfg.cnv_dim
        mk = lambda o: tnn.ModuleList([tnn.Conv2d(c, o, 1)
                                       for _ in range(cfg.n_stacks)])
        self.hp_convs = mk(h.n_keypoints)
        if h.include_background:
            self.bghp_convs = mk(1)
        if h.include_jitter_offset:
            self.jitter_convs = mk(2)


class THeads1(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        h, c = cfg.heads, cfg.cnv_dim
        mk = lambda o: tnn.ModuleList([tnn.Conv2d(c, o, 1)
                                       for _ in range(cfg.n_stacks)])
        self.reg_convs = mk(2 * h.n_limbs)
        if h.include_spread:
            self.spread_convs = mk(h.n_limbs)
        if h.include_scale:
            self.scale_convs = mk(h.n_keypoints)


class TNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.basenet = TBase(cfg)
        self.headnets = tnn.ModuleList([THeads0(cfg), THeads1(cfg)])

    def forward(self, x):
        feats = self.basenet(x)
        h0, h1 = self.headnets
        out = {'hmp': [], 'bg': [], 'jomp': [], 'omp': [], 'scmp': []}
        for s, f in enumerate(feats):
            out['hmp'].append(h0.hp_convs[s](f))
            if hasattr(h0, 'bghp_convs'):
                out['bg'].append(h0.bghp_convs[s](f))
            if hasattr(h0, 'jitter_convs'):
                out['jomp'].append(h0.jitter_convs[s](f))
            out['omp'].append(h1.reg_convs[s](f))
            if hasattr(h1, 'scale_convs'):
                out['scmp'].append(h1.scale_convs[s](f))
        return out


# --------------------------------------------------------------------------- #

def _tame(sd):
    """Rescale the random synthetic weights so a ~30-layer forward stays
    numerically sane: He-ish conv scaling and bounded BN variances."""
    out = {}
    for k, v in sd.items():
        if v.ndim == 4:
            fan_in = v.shape[1] * v.shape[2] * v.shape[3]
            out[k] = (v / np.sqrt(fan_in)).astype(np.float32)
        elif k.endswith('running_var'):
            out[k] = (np.abs(v) + 0.5).astype(np.float32)
        else:
            out[k] = v
    return out


def _nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def test_converted_forward_matches_torch():
    cfg = tiny_cfg()
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    sd = _tame(synth_torch_sd(variables, cfg))

    replica = TNet(cfg)
    missing, unexpected = replica.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    # bidirectional key validation: the only keys the synthetic reference
    # state_dict lacks are torch's num_batches_tracked counters
    assert all(k.endswith('num_batches_tracked') for k in missing), missing
    assert not unexpected, unexpected

    converted, miss = C.convert_torch_state_dict(sd, variables, cfg)
    assert not miss, miss[:10]

    rng = np.random.RandomState(5)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)

    replica.eval()
    with torch.no_grad():
        t_out = replica(_nchw(x))
    j_out = model.apply(converted, jnp.asarray(x), train=False)

    for key in ('hmp', 'bg', 'jomp', 'omp', 'scmp'):
        for s in range(cfg.n_stacks):
            ours = np.asarray(j_out[key][s])
            ref = np.transpose(t_out[key][s].numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                ours, ref, rtol=2e-3, atol=2e-4,
                err_msg=f'{key} stack {s}')


def test_converted_forward_matches_torch_odd_input():
    """Odd spatial input exercises the stride-2 padding geometry the hardest
    (the s2d stem falls back to the dense conv here)."""
    cfg = tiny_cfg()
    model = PoseNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    sd = _tame(synth_torch_sd(variables, cfg))
    replica = TNet(cfg)
    replica.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                            strict=False)
    converted, _ = C.convert_torch_state_dict(sd, variables, cfg)

    rng = np.random.RandomState(6)
    # 64 = stride-16 multiple for hg_order=2 (4 * 2^2); the point is a
    # *different* size than the init shape, proving shape-polymorphic parity
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    replica.eval()
    with torch.no_grad():
        t_out = replica(_nchw(x))
    j_out = model.apply(converted, jnp.asarray(x), train=False)
    ours = np.asarray(j_out['hmp'][-1])
    ref = np.transpose(t_out['hmp'][-1].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)
