"""Adversarial grouping parity: merge chains, equal-score ties, shared-start
spawns -- XLA vs Pallas vs the NumPy spec vs a STRICT port of the reference.

The key adversarial mechanism (reference fixme, decoder/group.py:126-127):
`_delete_reconns` dedups only the END keypoint index, so several limbs of one
type sharing a START keypoint all spawn separate skeleton rows that share one
ind. A later limb type matching that shared ind co-extends ALL of those rows
with the same connection, creating >= 2 merge pairs at once -- possibly at
the FINAL limb type. The reference merges all pairs in one shot from a
pre-merge snapshot, losing chained mergees' keypoints (group.py:140-155);
our implementations merge one mergee per target per pass plus
`settle_passes` merge-only passes, converging to the lossless union.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from offsetguided_tpu.config.defaults import DecoderConfig
from offsetguided_tpu.ops.grouping import group_skeletons
from offsetguided_tpu.ops.grouping_ref import group_skeletons_ref
from offsetguided_tpu.ops.pallas.grouping_pallas import (
    group_skeletons_pallas, group_skeletons_xla_core)

from grouping_strict import group_skeletons_strict

J4 = 5
SK4 = ((1, 3), (1, 2))          # two limb types over joints {1, 2, 3}


def conn(x1, y1, v1, x2, y2, v2, i1, i2, delta, length, score, s1=6.0, s2=6.0):
    return [x1, y1, v1, x2, y2, v2, i1, i2, delta, length, score, s1, s2]


def empty_limbs(L, K):
    limbs = np.zeros((L, K, 13), dtype=np.float64)
    limbs[:, :, 0:2] = -99999.0
    limbs[:, :, 3:5] = -99999.0
    return limbs


def chain_limbs():
    """Three rows spawned from one shared START keypoint (ind 101), then
    co-extended by one conn at the FINAL limb type -> 3 simultaneous merge
    pairs. Middle row carries the LARGEST end ind (999) so the reference's
    snapshot merge demonstrably loses it."""
    limbs = empty_limbs(2, 4)
    # limb 0 (1->3): three conns share ind1=101, distinct ind2 (dedup keeps
    # all three; reference fixme case)
    limbs[0, 0] = conn(10, 10, .9, 14, 20, .8, 101, 103, 1.0, 10.0, .70)
    limbs[0, 1] = conn(10, 10, .9, 10, 21, .8, 101, 999, 1.0, 10.0, .65)
    limbs[0, 2] = conn(10, 10, .9, 6, 20, .8, 101, 303, 1.0, 10.0, .60)
    # limb 1 (1->2), FINAL type: one conn matching all three rows at jf
    limbs[1, 0] = conn(10, 10, .9, 10, 15, .85, 101, 102, 1.0, 5.0, .80)
    return limbs


def run_all(limbs, cfg, J=J4, skeleton=SK4):
    """(xla, core, pallas, ref) outputs, each (poses, scores, count)."""
    p1, s1, c1 = group_skeletons(jnp.asarray(limbs[None]), skeleton, cfg,
                                 n_keypoints=J)
    p2, s2, c2 = group_skeletons_xla_core(jnp.asarray(limbs[None]), skeleton,
                                          cfg, n_keypoints=J)
    p3, s3, c3 = group_skeletons_pallas(jnp.asarray(limbs[None]), skeleton,
                                        cfg, n_keypoints=J, interpret=True)
    rp, rs = group_skeletons_ref(limbs, skeleton, person_thre=cfg.person_thre,
                                 sort_dim=cfg.sort_dim, dist_max=cfg.dist_max,
                                 use_scale=cfg.use_scale, n_keypoints=J,
                                 max_poses=cfg.max_poses,
                                 settle_passes=cfg.settle_passes)
    outs = []
    for p, s, c in ((p1, s1, c1), (p2, s2, c2), (p3, s3, c3)):
        outs.append((np.asarray(p[0]), np.asarray(s[0]), int(np.asarray(c[0]))))
    outs.append((rp, rs, len(rs)))
    return outs


def _match_pose_sets(pa, pb, n, atol=1e-4):
    """Greedy one-to-one matching of pose rows by content. Pose SETS must be
    identical; ORDER may differ where scores tie to within float
    rounding (the implementations reduce the score sum in different orders,
    so near-equal scores can land 1 ulp apart and swap sort positions)."""
    unused = list(range(n))
    for i in range(n):
        hit = None
        for j in unused:
            if np.allclose(pa[i], pb[j], atol=atol):
                hit = j
                break
        assert hit is not None, \
            f'pose {i} of A has no match in B:\n{pa[i]}\ncandidates ' \
            f'{[pb[j] for j in unused]}'
        unused.remove(hit)


def assert_device_parity(outs):
    """XLA == core == Pallas == NumPy spec: identical pose sets (order-free
    under float-rounding score ties)."""
    (p0, s0, c0) = outs[0]
    for i, (p, s, c) in enumerate(outs[1:3], 1):
        assert c == c0, f'impl {i} count {c} != {c0}'
        _match_pose_sets(p0[:c0], p[:c0], c0)
    rp, rs, rc = outs[3]
    assert rc == c0, f'spec count {rc} != {c0}'
    _match_pose_sets(p0[:c0], rp[:rc], c0)


def test_final_limb_merge_chain_settles():
    limbs = chain_limbs()
    cfg = DecoderConfig(person_thre=0.01, dist_max=20.0, use_scale=False,
                        max_poses=8)
    outs = run_all(limbs, cfg)
    assert_device_parity(outs)
    poses, scores, count = outs[0]
    # all three spawned rows merged into ONE pose holding the union of
    # keypoints, including the chained mergee's ind 999
    assert count == 1, f'chain did not settle: {count} poses'
    got_inds = set(poses[0, :, 5].astype(int)) - {0}
    assert got_inds == {101, 102, 999}, got_inds
    # elementwise-max merge keeps the largest j3 ind (999 beats 103/303)
    assert int(poses[0, 3, 5]) == 999


def test_chain_without_settling_dangles():
    """settle_passes=0 reproduces the round-2 behavior: the pair left
    unresolved at the final limb stays a separate partial pose."""
    limbs = chain_limbs()
    cfg = DecoderConfig(person_thre=0.01, dist_max=20.0, use_scale=False,
                        max_poses=8, settle_passes=0)
    outs = run_all(limbs, cfg)
    assert_device_parity(outs)
    assert outs[0][2] == 2      # merged pair + dangling third row


def test_strict_reference_loses_chained_keypoints():
    """The reference's all-pairs snapshot merge (group.py:140-155) merges the
    triple in one shot but OVERWRITES the first mergee's contribution with
    the second's: ind 999 (middle row) is lost; ours keeps it."""
    limbs = chain_limbs()
    sp, ss = group_skeletons_strict(limbs, SK4, person_thre=0.01,
                                    dist_max=20.0, use_scale=False,
                                    n_keypoints=J4)
    assert len(ss) == 1
    strict_inds = set(sp[0, :, 5].astype(int)) - {0}
    assert 999 not in strict_inds, \
        'reference merge kept 999? strict port no longer mirrors group.py'
    assert strict_inds == {101, 102, 303}
    # ours, for comparison (documented improvement, not a deviation bug)
    cfg = DecoderConfig(person_thre=0.01, dist_max=20.0, use_scale=False,
                        max_poses=8)
    poses, _, count = run_all(limbs, cfg)[0]
    assert set(poses[0, :, 5].astype(int)) - {0} == {101, 102, 999}


def test_equal_score_tie_dedup_first_index_wins():
    """Two conns with IDENTICAL scores and the same end ind: every
    implementation (incl. the strict port, whose stable sort keeps input
    order) must keep the first."""
    limbs = empty_limbs(2, 4)
    limbs[0, 0] = conn(10, 10, .9, 14, 20, .8, 101, 103, 1.0, 10.0, .5)
    limbs[0, 1] = conn(30, 30, .9, 14, 20, .8, 201, 103, 1.0, 10.0, .5)
    cfg = DecoderConfig(person_thre=0.01, dist_max=20.0, use_scale=False,
                        max_poses=8)
    outs = run_all(limbs, cfg)
    assert_device_parity(outs)
    poses, _, count = outs[0]
    assert count == 1
    assert set(poses[0, :, 5].astype(int)) - {0} == {101, 103}
    sp, ss = group_skeletons_strict(limbs, SK4, person_thre=0.01,
                                    dist_max=20.0, use_scale=False,
                                    n_keypoints=J4)
    assert len(ss) == 1
    assert set(sp[0, :, 5].astype(int)) - {0} == {101, 103}


def test_extension_tie_break_divergence_documented():
    """Two same-type conns can extend one skeleton at the same shared joint:
    ours attaches the HIGHEST-scoring one (grouping_ref.py refinement 1), the
    reference's fancy assignment keeps the LAST write = the LOWEST-scoring
    one. Both are internally consistent; the strict port must show the
    reference's choice."""
    limbs = empty_limbs(2, 4)
    limbs[0, 0] = conn(10, 10, .9, 14, 20, .8, 101, 103, 1.0, 10.0, .7)
    # limb 1 (1->2): two conns share ind1=101 (both match the row at jf),
    # distinct ind2 -> dedup keeps both; scores differ
    limbs[1, 0] = conn(10, 10, .9, 10, 15, .9, 101, 102, 1.0, 5.0, .8)
    limbs[1, 1] = conn(10, 10, .9, 12, 15, .6, 101, 202, 1.0, 5.0, .3)
    cfg = DecoderConfig(person_thre=0.01, dist_max=20.0, use_scale=False,
                        max_poses=8)
    outs = run_all(limbs, cfg)
    assert_device_parity(outs)
    poses, _, count = outs[0]
    ours_j2 = int(poses[0, 2, 5])
    assert ours_j2 == 102, 'ours must attach the best-scoring candidate'
    sp, ss = group_skeletons_strict(limbs, SK4, person_thre=0.01,
                                    dist_max=20.0, use_scale=False,
                                    n_keypoints=J4)
    # strict: nonzero() row-major, duplicates last-write-wins -> the
    # lowest-scoring conn (sorted last) lands
    strict_j2 = int(sp[0, 2, 5])
    assert strict_j2 == 202, strict_j2
    # the losing conn spawns nothing in either semantics
    assert count == 1 and len(ss) == 1


def test_adversarial_fuzz_three_way_parity(rng):
    """Shared-start spawns, quantized (tie-prone) scores, deltas straddling
    dist_max, off-image pushes: XLA, core, Pallas and the NumPy spec must
    agree EXACTLY on every trial."""
    J = 7
    SK = ((1, 3), (2, 4), (1, 2), (3, 4), (4, 5))
    cfg = DecoderConfig(person_thre=0.01, dist_max=20.0, use_scale=False,
                        max_poses=12)
    for trial in range(10):
        K = 6
        limbs = empty_limbs(len(SK), K)
        ind_pool = rng.randint(100, 112, size=40)     # small pool -> sharing
        for l in range(len(SK)):
            for k in range(K):
                if rng.rand() < 0.25:
                    continue                           # leave empty slot
                i1 = int(ind_pool[rng.randint(len(ind_pool))])
                i2 = int(ind_pool[rng.randint(len(ind_pool))])
                score = round(float(rng.rand()), 1)    # quantized -> ties
                delta = float(rng.choice([1.0, 19.9, 20.0, 25.0]))
                x1, y1 = float(rng.randint(1, 50)), float(rng.randint(1, 50))
                x2, y2 = float(rng.randint(1, 50)), float(rng.randint(1, 50))
                if rng.rand() < 0.15:
                    x1 = -99999.0                      # off-image push
                limbs[l, k] = conn(x1, y1, .9, x2, y2, .8, i1, i2, delta,
                                   10.0, score)
        outs = run_all(limbs, cfg, J=J, skeleton=SK)
        try:
            assert_device_parity(outs)
        except AssertionError as e:
            raise AssertionError(f'trial {trial}: {e}')
