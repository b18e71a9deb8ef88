"""Production-width sharded lowering check (VERDICT round-2 item 7).

The multi-chip dryrun executes a NARROW hourglass; channel-parallel edge
cases (divisibility of every real width by the model axis, sharding-spec
propagation through the full recursion) only appear at production widths.
This test lowers -- does NOT compile or run -- the full-width Hourglass-104
training step over the virtual 8-device (data=4, model=2) mesh using
abstract `ShapeDtypeStruct` arguments, so the 187.7M-param model costs
tracing time only.
"""
import jax
import jax.numpy as jnp

from offsetguided_tpu.config.defaults import LossConfig, ModelConfig, TrainConfig
from offsetguided_tpu.models import PoseNet
from offsetguided_tpu.ops.encoder import Targets
from offsetguided_tpu.parallel import (batch_sharding, create_train_state,
                                       make_mesh, make_optimizer,
                                       make_train_step, param_sharding,
                                       replicated)


def _with_sharding(struct_tree, sharding_tree):
    return jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        struct_tree, sharding_tree)


def test_fullwidth_train_step_lowers_on_4x2_mesh():
    assert jax.device_count() >= 8
    mesh = make_mesh(4, 2)

    cfg = ModelConfig()                      # PRODUCTION widths (..., 512)
    model = PoseNet(cfg)
    batch, hw = 8, 128
    out_hw = hw // 4
    J, L = cfg.heads.n_keypoints, cfg.heads.n_limbs

    img_s = jax.ShapeDtypeStruct((batch, hw, hw, 3), jnp.float32)
    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jax.ShapeDtypeStruct((1, hw, hw, 3),
                                                     jnp.float32))
    tx = make_optimizer(TrainConfig(learning_rate=1e-4))
    state_shapes = jax.eval_shape(lambda v: create_train_state(v, tx),
                                  var_shapes)

    # the production sharding rules from parallel/mesh.py
    p_shard = param_sharding(state_shapes.params, mesh)
    o_shard = jax.tree_util.tree_map(
        lambda leaf: (param_sharding(leaf, mesh)
                      if hasattr(leaf, 'ndim') else replicated(mesh)),
        state_shapes.opt_state, is_leaf=lambda x: hasattr(x, 'ndim'))
    state_s = state_shapes._replace(
        params=_with_sharding(state_shapes.params, p_shard),
        batch_stats=jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=replicated(mesh)),
            state_shapes.batch_stats),
        opt_state=jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            state_shapes.opt_state, o_shard),
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=replicated(mesh)))

    bsh = batch_sharding(mesh)

    def b(c, dtype=jnp.float32):
        return jax.ShapeDtypeStruct((batch, out_hw, out_hw, c), dtype,
                                    sharding=bsh)

    targets_s = Targets(hmp=b(J), bg=b(1), jomp=b(2), omp=b(2 * L),
                        scmp=b(J), pscmp=b(2 * L))
    mask_s = b(1, jnp.bool_)
    img_s = jax.ShapeDtypeStruct(img_s.shape, img_s.dtype, sharding=bsh)

    train_step = make_train_step(model, tx, LossConfig())
    with mesh:
        lowered = jax.jit(train_step).lower(state_s, img_s, targets_s, mask_s)
    # successful lowering is the assertion: every sharding spec was accepted
    # and the StableHLO module was built at production widths
    assert lowered.in_tree is not None
