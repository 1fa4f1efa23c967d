"""Mesh/sharding: 2-D (data x model) tensor-parallel layout equivalence."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh_2d,
    param_shardings,
    shard_params,
)
from tests.test_models import tiny_cfg


def _batch(rng, B, cfg):
    v = rng.randn(B, 8, cfg.v_dim).astype(np.float32)
    return {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, cfg.ntoken + 1, (B, 12))),
        "a": jnp.asarray(rng.randint(0, cfg.ntoken + 1, (B, 3))),
        "target": jnp.asarray(rng.rand(B, cfg.num_ans_candidates).astype(np.float32)),
    }


def test_param_shardings_select_tp_dims(rng):
    cfg = tiny_cfg(model="cti", num_ans_candidates=16)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh_2d(4, 2)
    sh = param_shardings(params, mesh)
    assert sh["classifier"]["l2"]["v"].spec == P(MODEL_AXIS, None)
    # a vocab the model axis can't divide (the REAL 3129) replicates
    # instead of crashing device_put (found by the reference-dims dryrun)
    odd = build_model(tiny_cfg(model="cti", num_ans_candidates=3129))
    sh_odd = param_shardings(odd.init(jax.random.PRNGKey(0)), mesh)
    assert sh_odd["classifier"]["l2"]["v"].spec == P()
    assert sh_odd["t_att"]["tc"]["T_g"].spec == P(MODEL_AXIS)
    assert sh["classifier"]["l2"]["b"].spec == P(MODEL_AXIS)
    assert sh["t_att"]["tc"]["T_g"].spec == P(MODEL_AXIS)
    assert sh["t_att"]["tc"]["v_net"]["l0"]["v"].spec == P(MODEL_AXIS)
    # Megatron pair: column-parallel t_net tuckers, row-parallel prjs
    assert sh["t_net0"]["v_tucker"]["l0"]["v"].spec == P(MODEL_AXIS, None)
    assert sh["t_net1"]["q_tucker"]["l0"]["b"].spec == P(MODEL_AXIS)
    assert sh["q_prj0"]["l0"]["v"].spec == P(None, MODEL_AXIS)
    assert sh["a_prj1"]["l0"]["b"].spec == P()
    # everything else replicated
    assert sh["w_emb"]["emb"].spec == P()
    assert sh["q_emb"]["fwd"]["w_ih"].spec == P()


def test_tp_forward_matches_replicated(rng):
    """CTI forward on a 4x2 (data x model) mesh with sharded classifier/core
    equals the unsharded single-device result."""
    assert len(jax.devices()) == 8
    cfg = tiny_cfg(model="cti", num_ans_candidates=16)  # divisible by tp=2
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(1))
    batch = _batch(rng, B=8, cfg=cfg)

    want, _ = jax.jit(lambda p, b: model.apply(p, b))(params, batch)

    mesh = make_mesh_2d(4, 2)
    p_sharded = shard_params(params, mesh)
    b_sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), batch)
    got, _ = jax.jit(lambda p, b: model.apply(p, b))(p_sharded, b_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_tp4_fits_fallback_train_step_matches(rng):
    """TP generality at model=4 (VERDICT r4 #5): a 2x4 (data x model) mesh
    where the REAL odd 3129-answer vocab takes the ``fits``-replicate branch
    (``parallel/sharding.py``) while the rank dim (divisible by 4) still
    shards — assert the branch fires AND the full train step matches the
    unsharded run."""
    from vqatpu.train.steps import TrainState, make_train_state, make_train_step

    cfg = tiny_cfg(model="cti", num_ans_candidates=3129)
    tcfg = TrainConfig(update_freq=1)
    model = build_model(cfg)
    step = make_train_step(model, tcfg)
    batch = _batch(rng, B=8, cfg=cfg)

    mesh = make_mesh_2d(2, 4)
    params = model.init(jax.random.PRNGKey(5))
    sh = param_shardings(params, mesh)
    # the fits-replicate branch actually fires for the odd vocab at tp=4...
    assert sh["classifier"]["l2"]["v"].spec == P()
    assert sh["classifier"]["l2"]["b"].spec == P()
    # ...while rank-dim leaves (rank % 4 == 0) still shard over model=4
    assert sh["t_att"]["tc"]["T_g"].spec == P(MODEL_AXIS)
    assert sh["t_att"]["tc"]["v_net"]["l0"]["v"].spec == P(MODEL_AXIS)
    assert sh["t_net0"]["v_tucker"]["l0"]["v"].spec == P(MODEL_AXIS, None)
    assert sh["q_prj0"]["l0"]["v"].spec == P(None, MODEL_AXIS)

    s0 = make_train_state(model, jax.random.PRNGKey(2))
    s_ref, m_ref = step(s0, batch, jnp.float32(1e-3), jax.random.PRNGKey(3))

    s1 = make_train_state(model, jax.random.PRNGKey(2))
    s1 = TrainState(
        params=shard_params(s1.params, mesh),
        opt_state=s1.opt_state,
        grad_accum=shard_params(s1.grad_accum, mesh),
        accum_count=s1.accum_count,
        step=s1.step,
    )
    b_sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), batch)
    s2, m2 = step(s1, b_sharded, jnp.float32(1e-3), jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(m2["loss"]), float(m_ref["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_train_step_runs_and_matches(rng):
    """Full train step over the 2-D mesh: loss equal to the 1-device run."""
    from vqatpu.train.steps import TrainState, make_train_state, make_train_step

    cfg = tiny_cfg(model="cti", num_ans_candidates=16)
    tcfg = TrainConfig(update_freq=1)
    model = build_model(cfg)
    step = make_train_step(model, tcfg)
    batch = _batch(rng, B=8, cfg=cfg)

    s0 = make_train_state(model, jax.random.PRNGKey(2))
    s_ref, m_ref = step(s0, batch, jnp.float32(1e-3), jax.random.PRNGKey(3))

    mesh = make_mesh_2d(4, 2)
    s1 = make_train_state(model, jax.random.PRNGKey(2))
    s1 = TrainState(
        params=shard_params(s1.params, mesh),
        opt_state=s1.opt_state,
        grad_accum=shard_params(s1.grad_accum, mesh),
        accum_count=s1.accum_count,
        step=s1.step,
    )
    b_sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), batch)
    s2, m2 = step(s1, b_sharded, jnp.float32(1e-3), jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(m2["loss"]), float(m_ref["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
