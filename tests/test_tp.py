"""Tensor parallelism (infgen_tpu/parallel/tp.py) on the 8-virtual-CPU mesh.

The reference has no TP path (DDP replicas only, run.py:106-146); these tests
prove the Megatron-style sharding rules are (a) applied where intended and
(b) numerically inert — dp x tp training and TP-sharded rollout produce the
same results as the replicated baselines, with the collectives inserted by
GSPMD rather than hand-written.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.parallel.tp import make_mesh, tree_param_specs
from infgen_tpu.train.train_step import Trainer, stack_scenarios

TINY = dict(max_agents=16, max_map_tokens=128, num_agent_layers=2,
            num_seed_layers=1, num_map_layers=1, hidden_dim=32,
            num_heads=2, head_dim=16, num_freq_bands=8,
            num_seed_feature=4, num_recurrent_steps_val=20)


def _flat_named(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(p): l for p, l in flat}


def test_make_mesh_validation():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(np.array(jax.devices()[:1]), model=2)
    with pytest.warns(UserWarning, match="uses only"):
        m = make_mesh(np.array(jax.devices()[:7]), model=3)
    assert dict(m.shape) == {"data": 2, "model": 3}


def test_param_spec_rules():
    cfg = Config(**TINY)
    tr = Trainer(cfg, mesh=make_mesh(data=4, model=2))
    state = tr.init_state(jax.random.PRNGKey(0),
                          make_synthetic_scenario(cfg, seed=0, num_agents=8))
    specs = tree_param_specs(state.params, tp=2)
    named = _flat_named(specs)
    col = [k for k, s in named.items() if s == P(None, "model")]
    row = [k for k, s in named.items() if s == P("model", None)]
    assert any("to_q" in k and "kernel" in k for k in col)
    assert any("ff_0" in k and "kernel" in k for k in col)
    assert any("w_kr" in k for k in col)
    assert any("to_out" in k and "kernel" in k for k in row)
    assert any("ff_1" in k and "kernel" in k for k in row)
    # layernorms and embeddings stay replicated
    assert all(s == P() for k, s in named.items()
               if "norm" in k.lower() or "emb" in k.lower())
    # every sharded dim must divide by tp
    params = _flat_named(state.params)
    for k, s in named.items():
        for ax, name in enumerate(s):
            if name == "model":
                assert params[k].shape[ax] % 2 == 0, (k, params[k].shape)


def test_tp_train_step_matches_dp():
    cfg = Config(**TINY)
    mesh_tp = make_mesh(data=4, model=2)
    tr = Trainer(cfg, mesh=mesh_tp)
    scens = [make_synthetic_scenario(cfg, seed=s, num_agents=8)
             for s in range(4)]
    state = tr.replicate_state(
        tr.init_state(jax.random.PRNGKey(0), scens[0]))
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    n_sharded = sum(1 for _, l in flat if not l.sharding.is_fully_replicated)
    assert n_sharded > 20, "TP placement left all params replicated"
    batch = tr.shard_batch(stack_scenarios(scens))
    state2, logs = tr.train_step(state, batch, jax.random.PRNGKey(1))
    # params must STAY sharded through the update (no silent re-replication)
    flat2 = jax.tree_util.tree_flatten_with_path(state2.params)[0]
    n_sharded2 = sum(1 for _, l in flat2
                     if not l.sharding.is_fully_replicated)
    assert n_sharded2 == n_sharded

    tr_dp = Trainer(cfg, mesh=Mesh(np.array(jax.devices()[:4]), ("data",)))
    state_dp = tr_dp.replicate_state(
        tr_dp.init_state(jax.random.PRNGKey(0), scens[0]))
    batch_dp = tr_dp.shard_batch(stack_scenarios(scens))
    _, logs_dp = tr_dp.train_step(state_dp, batch_dp, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(logs["loss"]), float(logs_dp["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(logs["grad_norm"]),
                               float(logs_dp["grad_norm"]), rtol=1e-4)


def test_tp_rollout_matches_replicated():
    from infgen_tpu.rollout.closed_loop import make_rollout_fn

    cfg = Config(**TINY)
    mesh = make_mesh(data=4, model=2)
    tr = Trainer(cfg, mesh=mesh)
    scen = make_synthetic_scenario(cfg, seed=0, num_agents=8)
    state = tr.init_state(jax.random.PRNGKey(0), scen)
    inputs = jax.jit(lambda s, r: build_model_inputs(
        cfg, tr.motion_tok, tr.attr, s, r))(scen, jax.random.PRNGKey(2))
    rollout = make_rollout_fn(tr.model, cfg, tr.attr, tr.motion_tok,
                              tr.map_vocab, jit=False)
    repl = NamedSharding(mesh, P())
    params_repl = jax.device_put(state.params, repl)
    out_repl = jax.jit(rollout, in_shardings=(repl, repl, repl, repl))(
        params_repl, scen, inputs, jax.random.PRNGKey(3))
    params_tp = jax.tree.map(jax.device_put, state.params,
                             tr.param_shardings(state.params))
    out_tp = jax.jit(rollout, in_shardings=(
        tr.param_shardings(state.params), repl, repl, repl))(
        params_tp, scen, inputs, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out_tp["next_token_idx"]),
                                  np.asarray(out_repl["next_token_idx"]))
    np.testing.assert_allclose(np.asarray(out_tp["pred_traj"]),
                               np.asarray(out_repl["pred_traj"]),
                               atol=1e-4)
