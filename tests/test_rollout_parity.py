"""Closed-loop rollout parity: the repo's `rollout/closed_loop.py` scan vs the
reference `InfGenAgentDecoder.inference` (agent_decoder.py:1605-2389) with
transplanted weights on the same scenario.

This is the harness VERDICT r2 ranked #1: it converts the flagship path from
"verified by construction" (component parity + internal equivalence) into
"verified end-to-end" — per-step sampled token ids, state ids, and 10 Hz
trajectories are compared directly.

Determinism: both sides sample via top-k + multinomial (reference
agent_decoder.py:1902-1904, 2163/2194; repo ops/sampling.py). With
motion_beam_size = insert_beam_size = 1, top-k degenerates to argmax and the
multinomial over a single bucket always picks it, so both rollouts are
deterministic functions of the (identical, transplanted) weights — no RNG
stream alignment is needed.

Modes:
  motion — disable_insertion=True, max_agents == num_agents: every array row
           aligns 1:1; token ids must be bitwise equal, trajectories < 1e-3.
  insert — forced insertion (reference DEBUG=1, agent_decoder.py:1888-1889;
           repo force_insert=True) with enough free slots (max_agents=40) that
           neither side's capacity binds before the shared per-step budget
           (insert_limit=10, agent_decoder.py:1738/1776). The repo activates
           slots in append order, so inserted rows align with the reference's
           torch.cat rows.

Scenario construction keeps every neighbor cap non-binding (map tokens spaced
12 m, initial agents >= 6 m apart) so the repo's nearest-k neighbor tables
select the same sets as the reference's radius graphs.
"""

import os

import jax
import numpy as np
import pytest
import torch

from infgen_tpu.config import Config, ENTER_STATE, INVALID_STATE
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.scenario import build_scenario
from infgen_tpu.model.infgen import InfGenModel
from infgen_tpu.rollout.closed_loop import make_rollout_fn
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from infgen_tpu.tokenizers.vocab import load_map_vocab
from tests import ref_bridge


def _cfg(max_agents, steps, disable_insertion):
    return Config(
        max_agents=max_agents, max_map_tokens=16, num_token_steps=18,
        hidden_dim=64, num_heads=4, head_dim=16, num_freq_bands=8,
        num_agent_layers=3, num_seed_layers=3, num_map_layers=1,
        num_seed_feature=10, dropout=0.0,
        grid_range=60.0, grid_interval=3.0, pl2seed_radius=30.0,
        a2a_radius=25.0, pl2a_radius=20.0, a2sa_radius=10.0, pl2sa_radius=10.0,
        time_span=60, predict_occ=True, remat_attention=False,
        num_recurrent_steps_val=steps, disable_insertion=disable_insertion,
        motion_beam_size=1, insert_beam_size=1)


def _scenario(cfg, A=14):
    """14 agents, all valid at the history boundary (the reference's filter
    physically removes rows and would break slot alignment otherwise); one
    enters during history to exercise bos handling. 14 > the reference's
    10-row temporal quirk slice (see Config.ref_rollout_quirks (quirk #1)), so rows 0-3
    exercise real temporal attention while rows 4+ exercise the quirk's
    zero-aggregate path. Map tokens 12 m apart."""
    T10 = 91
    rng = np.random.default_rng(11)
    valid = np.ones((A, T10), bool)
    valid[6, :3] = False                        # enters during history
    pos = np.zeros((A, T10, 2), np.float32)
    heading = np.zeros((A, T10), np.float32)
    vel = np.zeros((A, T10, 2), np.float32)
    t = np.arange(T10, dtype=np.float32) * 0.1
    for a in range(A):
        speed = 1.0 + 0.8 * a
        lane_y = (a % 5) * 6.0 - 12.0
        x0 = -20.0 + 4.0 * a
        ang = 0.15 * (a - 4)
        heading[a] = ang + 0.05 * np.sin(t + a)
        pos[a, :, 0] = x0 + speed * t * np.cos(ang)
        pos[a, :, 1] = lane_y + speed * t * np.sin(ang)
        vel[a, :, 0] = speed * np.cos(ang)
        vel[a, :, 1] = speed * np.sin(ang)
    pos += rng.normal(scale=0.05, size=pos.shape).astype(np.float32)
    shape = np.tile(np.array([[4.3, 1.8, 1.5]], np.float32), (A, 1))
    type_ = (np.array([0, 0, 0, 1, 0, 2, 0, 0, 1, 0, 0, 1, 0, 2, 0, 0])[:A]
             .astype(np.int32))
    agent_arrays = dict(valid=valid, position=pos, heading=heading,
                        velocity=vel, shape=shape, type=type_, av_index=0)

    P = 16
    mp = np.zeros((P, 2), np.float32)
    mp[:, 0] = np.linspace(-40.0, 140.0, P)
    mp[:, 1] = 8.0
    map_arrays = dict(
        position=mp, orientation=np.linspace(-0.3, 0.3, P).astype(np.float32),
        token_idx=rng.integers(0, 1024, P).astype(np.int32),
        pt_type=np.zeros(P, np.int32), pt_side=np.zeros(P, np.int32),
        pl_type=np.zeros(P, np.int32), light_type=np.zeros(P, np.int32),
        chain_id=np.zeros(P, np.int32), chain_pos=np.arange(P, dtype=np.int32))
    return build_scenario(agent_arrays, map_arrays, cfg.max_agents,
                          cfg.max_map_tokens)


def _run_pair(cfg, force_insert, debug=False):
    """Run the repo scan rollout and the reference python-loop rollout with
    the same weights; return (repo_out, ref_out, n_real_agents)."""
    scenario = _scenario(cfg)
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    inputs = build_model_inputs(cfg, mt, attr, scenario, jax.random.PRNGKey(0))
    inputs = jax.tree.map(np.asarray, inputs)

    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    params = variables["params"]

    rollout = make_rollout_fn(model, cfg, attr, mt, map_vocab,
                              force_insert=force_insert, debug=debug)
    repo_out = rollout(params, scenario, inputs, jax.random.PRNGKey(3))
    repo_out = jax.tree.map(np.asarray, repo_out)

    # same map features for the reference (the rollout computes x_pt from the
    # same params internally via model.encode_map)
    x_pt = np.asarray(model.apply(
        {"params": params}, scenario.map, map_vocab["traj_src"],
        method=lambda m, *a: m.encode_map(*a))["x_pt"], np.float32)

    n_real = 14
    ref_dec, _ = ref_bridge.make_ref_decoder(cfg)
    ref_bridge.transplant_agent_decoder(params["agent_decoder"], ref_dec, cfg)
    ref_dec.num_recurrent_steps_val = cfg.num_recurrent_steps_val
    ref_dec.motion_beam_size = 1
    ref_dec.insert_beam_size = 1
    ref_dec.disable_insertion = cfg.disable_insertion

    data = ref_bridge.build_ref_data(cfg, scenario, inputs, mt,
                                     num_agents=n_real,
                                     num_token_steps=cfg.num_infer_steps)
    if force_insert:
        os.environ["DEBUG"] = "1"
    try:
        torch.manual_seed(0)
        with torch.no_grad():
            ref_out = ref_dec.inference(
                data, {"x_pt": torch.from_numpy(x_pt[:16])})
    finally:
        os.environ.pop("DEBUG", None)
    ref_out = {k: (v.numpy() if torch.is_tensor(v) else v)
               for k, v in ref_out.items()}
    return repo_out, ref_out, n_real


@pytest.fixture(scope="module")
def motion_pair():
    cfg = _cfg(max_agents=14, steps=50, disable_insertion=True)
    return _run_pair(cfg, force_insert=False) + (cfg,)


@pytest.fixture(scope="module")
def insert_pair():
    cfg = _cfg(max_agents=40, steps=20, disable_insertion=False)
    return _run_pair(cfg, force_insert=True) + (cfg,)


def _wrapdiff(a, b):
    d = np.abs(a - b)
    return np.minimum(d, 2 * np.pi - d)


# --------------------------------------------------------------------- #
# motion-only mode: every row aligns 1:1
# --------------------------------------------------------------------- #

def test_motion_token_ids_bitwise(motion_pair):
    """Per-step sampled motion tokens: bitwise equality over all 10 steps.

    Reference columns: 2 history + one per step (agent_decoder.py:1733-1735,
    2289); repo carry.token same layout (-2 bos sentinel mapped to -1)."""
    repo, ref, n, cfg = motion_pair
    np.testing.assert_array_equal(repo["next_token_idx"][:n],
                                  ref["next_token_idx"])


def test_motion_state_ids_bitwise(motion_pair):
    repo, ref, n, cfg = motion_pair
    np.testing.assert_array_equal(repo["next_state_idx"][:n],
                                  ref["next_state_idx"])


def test_motion_trajectories(motion_pair):
    """10 Hz stitched trajectories within 1e-3 m (agent_decoder.py:2200-2211,
    2303-2335). Valid steps only (invalid steps are zeroed on both sides)."""
    repo, ref, n, cfg = motion_pair
    v = ref["pred_valid"][:, :, None].astype(bool)
    err = np.abs(repo["pred_traj"][:n] - ref["pred_traj"]) * v
    assert err.max() < 1e-3, f"traj err {err.max():.2e}"
    herr = _wrapdiff(repo["pred_head"][:n], ref["pred_head"]) * v[..., 0]
    assert herr.max() < 1e-3, f"head err {herr.max():.2e}"


def test_motion_valid_and_token_pose(motion_pair):
    """2 Hz token-resolution pose arrays (pos_a/head_a) and validity."""
    repo, ref, n, cfg = motion_pair
    np.testing.assert_array_equal(repo["pred_valid"][:n], ref["pred_valid"])
    live = (ref["next_state_idx"] != INVALID_STATE)[:, :, None]
    err = np.abs(repo["pos_a"][:n] - ref["pos_a"]) * live
    assert err.max() < 1e-3, f"pos_a err {err.max():.2e}"


# --------------------------------------------------------------------- #
# forced-insertion mode: append order == slot-activation order
# --------------------------------------------------------------------- #

def test_insert_counts_match(insert_pair):
    """Total and per-column insertion counts (enter states) match."""
    repo, ref, n, cfg = insert_pair
    n_ref = ref["pred_traj"].shape[0] - n
    n_repo = int(repo["n_inserted"])
    assert n_repo == n_ref, f"inserted {n_repo} vs reference {n_ref}"
    # per-column enter counts over the full array
    ref_enters = (ref["next_state_idx"] == ENTER_STATE).sum(0)
    repo_enters = (repo["next_state_idx"] == ENTER_STATE).sum(0)
    np.testing.assert_array_equal(repo_enters, ref_enters)


def test_insert_token_state_ids(insert_pair):
    repo, ref, n, cfg = insert_pair
    rows = ref["next_token_idx"].shape[0]
    np.testing.assert_array_equal(repo["next_token_idx"][:rows],
                                  ref["next_token_idx"])
    np.testing.assert_array_equal(repo["next_state_idx"][:rows],
                                  ref["next_state_idx"])


def test_insert_attrs(insert_pair):
    """Inserted-agent type/shape and pose at the enter column."""
    repo, ref, n, cfg = insert_pair
    rows = ref["pred_traj"].shape[0]
    np.testing.assert_array_equal(repo["pred_type"][:rows], ref["pred_type"])
    np.testing.assert_allclose(repo["pred_shape"][:rows], ref["pred_shape"],
                               atol=1e-3)
    v = ref["pred_valid"][:, :, None].astype(bool)
    err = np.abs(repo["pred_traj"][:rows] - ref["pred_traj"]) * v
    assert err.max() < 1e-3, f"traj err {err.max():.2e}"
