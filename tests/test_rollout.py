"""Closed-loop rollout tests: shape/invariant checks on a small config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infgen_tpu.config import Config, ENTER_STATE, INVALID_STATE, SHIFT
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.model.infgen import InfGenModel
from infgen_tpu.rollout.closed_loop import make_rollout_fn
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from infgen_tpu.tokenizers.vocab import load_map_vocab


@pytest.fixture(scope="module")
def setup():
    cfg = Config(max_agents=16, max_map_tokens=128, num_agent_layers=2,
                 num_seed_layers=1, num_map_layers=1, hidden_dim=32,
                 num_heads=2, head_dim=16, num_freq_bands=8,
                 num_recurrent_steps_val=30)  # 6 rollout steps
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    scenario = make_synthetic_scenario(cfg, seed=2, num_agents=10)
    inputs = build_model_inputs(cfg, mt, attr, scenario, jax.random.PRNGKey(0))
    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    rollout = make_rollout_fn(model, cfg, attr, mt, map_vocab, jit=True)
    out = rollout(variables["params"], scenario, inputs, jax.random.PRNGKey(7))
    return cfg, scenario, inputs, out


def test_rollout_shapes(setup):
    cfg, scenario, inputs, out = setup
    A = cfg.max_agents
    R = cfg.num_recurrent_steps_val
    Ti = (R + cfg.num_historical_steps) // SHIFT
    assert out["pred_traj"].shape == (A, cfg.num_historical_steps + R, 2)
    assert out["pred_state"].shape == (A, cfg.num_historical_steps + R)
    assert out["next_token_idx"].shape == (A, Ti)
    assert out["next_state_idx"].shape == (A, Ti)
    for k in ("pred_traj", "pred_head", "pos_a", "head_a"):
        assert bool(jnp.isfinite(out[k]).all()), k


def test_rollout_invariants(setup):
    cfg, scenario, inputs, out = setup
    state = np.asarray(out["next_state_idx"])
    pos = np.asarray(out["pos_a"])
    active = np.asarray(out["slot_active"])
    av = int(out["av_index"])

    # invalid steps carry zero positions (reference asserts this, :2351)
    assert np.all(pos[state == INVALID_STATE] == 0)
    # ego is forced valid through the whole rollout
    assert np.all(state[av, 2:] == 1)
    # inactive slots never produce valid states
    assert np.all(state[~active] == INVALID_STATE) or active.all()
    # initial agents that were active stay bounded (tokens move <= ~15m/token)
    act_pos = pos[active][:, 2:]
    step_jump = np.linalg.norm(np.diff(act_pos, axis=1), axis=-1)
    valid_pairs = (np.asarray(out["next_state_idx"])[active][:, 2:-1] != 0) & \
                  (np.asarray(out["next_state_idx"])[active][:, 3:] != 0)
    assert step_jump[valid_pairs].max() < 40.0, "untrained motion should stay in vocab range"


def test_rollout_insertion_counts(setup):
    cfg, scenario, inputs, out = setup
    n_ins = int(out["n_inserted"])
    per_step = np.asarray(out["per_step_inserted"])
    assert per_step.sum() == n_ins
    assert per_step[0] == 0  # no insertion at t=0
    assert (per_step <= cfg.insert_limit).all()
    # inserted agents occupy previously-free slots
    n_initial = int(np.asarray(inputs.slot_mask).sum())
    n_active = int(np.asarray(out["slot_active"]).sum())
    assert n_active <= cfg.max_agents
    assert n_active >= min(n_initial, n_active)

def test_rollout_quirks_off(setup):
    """ref_rollout_quirks=False (the 'repaired' semantics: full temporal
    attention for all rows, real type/shape categorical embeddings every
    column) compiles, runs, and keeps the same invariants."""
    cfg, scenario, inputs, _ = setup
    cfg2 = cfg.replace(ref_rollout_quirks=False)
    attr = AttrTokenizer(cfg2.grid_range, cfg2.grid_interval,
                         cfg2.pl2seed_radius, cfg2.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    model = InfGenModel(cfg2, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    rollout = make_rollout_fn(model, cfg2, attr, mt, map_vocab, jit=True)
    out = rollout(variables["params"], scenario, inputs, jax.random.PRNGKey(7))
    state = np.asarray(out["next_state_idx"])
    pos = np.asarray(out["pos_a"])
    assert np.all(pos[state == INVALID_STATE] == 0)
    assert bool(jnp.isfinite(out["pred_traj"]).all())


def test_rollout_seed_kernel_ab(setup):
    """use_seed_kernel=True (ops/seed_kernel fused Mosaic eval; interpret
    mode on CPU) makes IDENTICAL insertion decisions to the decomposed XLA
    path at fp32 and matches trajectories to float round-off."""
    cfg, scenario, inputs, _ = setup
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    # num_seed_layers=3 exercises the full per-layer loop of the kernel
    # (the refine stack reuses trunk layers 0..2, so agent layers >= 3)
    cfg3 = cfg.replace(num_seed_layers=3, num_agent_layers=3)
    model = InfGenModel(cfg3, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    outs = {}
    for flag in (False, True):
        ro = make_rollout_fn(model, cfg3.replace(use_seed_kernel=flag), attr,
                             mt, map_vocab, jit=True, force_insert=True)
        outs[flag] = jax.device_get(
            ro(variables["params"], scenario, inputs, jax.random.PRNGKey(7)))
    a, b = outs[False], outs[True]
    assert np.array_equal(a["slot_active"], b["slot_active"])
    assert np.array_equal(a["pred_state"], b["pred_state"])
    assert np.array_equal(a["next_token_idx"], b["next_token_idx"])
    np.testing.assert_allclose(a["pred_traj"], b["pred_traj"], atol=1e-4)


def test_rollout_seed_kernel_full_ab(setup):
    """use_seed_kernel_full=True (precompute folded into the kernel;
    interpret mode on CPU) makes IDENTICAL insertion decisions to the
    decomposed XLA path at fp32 and matches trajectories to round-off."""
    cfg, scenario, inputs, _ = setup
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    cfg3 = cfg.replace(num_seed_layers=3, num_agent_layers=3)
    model = InfGenModel(cfg3, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    outs = {}
    for flag in (False, True):
        ro = make_rollout_fn(model, cfg3.replace(use_seed_kernel_full=flag),
                             attr, mt, map_vocab, jit=True, force_insert=True)
        outs[flag] = jax.device_get(
            ro(variables["params"], scenario, inputs, jax.random.PRNGKey(7)))
    a, b = outs[False], outs[True]
    assert np.array_equal(a["slot_active"], b["slot_active"])
    assert np.array_equal(a["pred_state"], b["pred_state"])
    assert np.array_equal(a["next_token_idx"], b["next_token_idx"])
    np.testing.assert_allclose(a["pred_traj"], b["pred_traj"], atol=1e-4)


def test_rollout_refine_candidates_ab(setup):
    """refine_map_candidates < P (the per-step ego-centred candidate subset
    for the per-insert refine topk) is BITWISE-identical to the full-P
    computation when the subset covers every token within
    pl2seed_radius + pl2sa_radius of ego (62 of 128 here; NC=96 leaves
    slack for ego drift)."""
    cfg, scenario, inputs, _ = setup
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    outs = {}
    for nc in (0, 96):
        ro = make_rollout_fn(model, cfg.replace(refine_map_candidates=nc),
                             attr, mt, map_vocab, jit=True, force_insert=True)
        outs[nc] = jax.device_get(
            ro(variables["params"], scenario, inputs, jax.random.PRNGKey(7)))
    a, b = outs[0], outs[96]
    assert np.array_equal(a["slot_active"], b["slot_active"])
    assert np.array_equal(a["pred_state"], b["pred_state"])
    assert np.array_equal(a["next_token_idx"], b["next_token_idx"])
    assert np.array_equal(a["pred_traj"], b["pred_traj"])
    assert np.array_equal(a["head_a"], b["head_a"])


def test_rollout_fixed_trip_ab(setup):
    """insertion_fixed_trip=True (fixed-trip fori_loop insertion, all writes
    masked by the running flag) is BITWISE-identical to the early-exit
    while_loop — in the default mode (loop exits on the seed head's stop,
    exercising frozen-lane selects incl. the rng key) and in forced-insert
    mode (maximal trips, budget exhaustion path)."""
    cfg, scenario, inputs, _ = setup
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    for forced in (False, True):
        outs = {}
        for flag in (False, True):
            ro = make_rollout_fn(model,
                                 cfg.replace(insertion_fixed_trip=flag),
                                 attr, mt, map_vocab, jit=True,
                                 force_insert=forced)
            outs[flag] = jax.device_get(
                ro(variables["params"], scenario, inputs,
                   jax.random.PRNGKey(7)))
        a, b = outs[False], outs[True]
        assert np.array_equal(a["slot_active"], b["slot_active"]), forced
        assert np.array_equal(a["pred_state"], b["pred_state"]), forced
        assert np.array_equal(a["next_token_idx"], b["next_token_idx"]), forced
        assert np.array_equal(a["pred_traj"], b["pred_traj"]), forced
        assert np.array_equal(a["per_step_inserted"],
                              b["per_step_inserted"]), forced


def test_rollout_fixed_trip_vmapped_ab(setup):
    """The fixed-trip form must also match under vmap, where the while_loop
    batching rule (run-while-any, select stopped lanes) is replaced by the
    fori_loop's unconditional trips — two scenarios with different insertion
    activity keep bitwise-equal outputs lane by lane."""
    cfg, scenario, inputs, _ = setup
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    from infgen_tpu.train.train_step import stack_scenarios
    scen2 = make_synthetic_scenario(cfg, seed=5, num_agents=4)
    batch = stack_scenarios([scenario, scen2])
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    inputs2 = jax.jit(jax.vmap(
        lambda s, r: build_model_inputs(cfg, mt, attr, s, r)))(batch, rngs)
    outs = {}
    for flag in (False, True):
        ro = make_rollout_fn(model, cfg.replace(insertion_fixed_trip=flag),
                             attr, mt, map_vocab, jit=False)
        vro = jax.jit(jax.vmap(ro, in_axes=(None, 0, 0, 0)))
        outs[flag] = jax.device_get(
            vro(variables["params"], batch, inputs2,
                jax.random.split(jax.random.PRNGKey(7), 2)))
    a, b = outs[False], outs[True]
    assert np.array_equal(a["slot_active"], b["slot_active"])
    assert np.array_equal(a["pred_state"], b["pred_state"])
    assert np.array_equal(a["next_token_idx"], b["next_token_idx"])
    assert np.array_equal(a["pred_traj"], b["pred_traj"])


def test_rollout_refine_kernel_ab(setup):
    """use_refine_kernel=True (fused per-insert refine; interpret on CPU)
    makes IDENTICAL insertion decisions and refined poses to the module
    path at fp32."""
    cfg, scenario, inputs, _ = setup
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    cfg3 = cfg.replace(num_seed_layers=3, num_agent_layers=3)
    model = InfGenModel(cfg3, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    outs = {}
    for flag in (False, True):
        ro = make_rollout_fn(model, cfg3.replace(use_refine_kernel=flag),
                             attr, mt, map_vocab, jit=True, force_insert=True)
        outs[flag] = jax.device_get(
            ro(variables["params"], scenario, inputs, jax.random.PRNGKey(7)))
    a, b = outs[False], outs[True]
    assert np.array_equal(a["slot_active"], b["slot_active"])
    assert np.array_equal(a["pred_state"], b["pred_state"])
    assert np.array_equal(a["next_token_idx"], b["next_token_idx"])
    np.testing.assert_allclose(a["pred_traj"], b["pred_traj"], atol=1e-4)


def test_rollout_column_kernel_ab(setup):
    """use_column_kernel=True (whole-trunk-column Mosaic kernel with the
    dynamic occupancy skip; interpret on CPU) makes IDENTICAL token/state
    decisions to the XLA motion_column at fp32 and matches trajectories to
    float round-off — including while insertion grows the active slot count
    (the kernel's n_rows bound moves between steps)."""
    cfg, scenario, inputs, _ = setup
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    cfg3 = cfg.replace(num_seed_layers=3, num_agent_layers=3)
    model = InfGenModel(cfg3, attr.grid, attr.grid_size, attr.angle_size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    outs = {}
    for flag in (False, True):
        ro = make_rollout_fn(model, cfg3.replace(use_column_kernel=flag),
                             attr, mt, map_vocab, jit=True, force_insert=True)
        outs[flag] = jax.device_get(
            ro(variables["params"], scenario, inputs, jax.random.PRNGKey(7)))
    a, b = outs[False], outs[True]
    assert np.array_equal(a["slot_active"], b["slot_active"])
    assert np.array_equal(a["pred_state"], b["pred_state"])
    assert np.array_equal(a["next_token_idx"], b["next_token_idx"])
    np.testing.assert_allclose(a["pred_traj"], b["pred_traj"], atol=1e-4)
