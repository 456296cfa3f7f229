"""Model-level parity: repo AgentDecoder vs the reference InfGenAgentDecoder
with transplanted weights on an identical tokenized scenario.

The layer test (tests/test_model.py) proves the attention math maps 1:1;
this harness proves the *composition* — mask construction, embedding/fusion
semantics, trunk/seed/refine stacking, and head wiring — by running the
actual reference model (via tests/pyg_stubs.py) and the repo model with the
same parameters and comparing raw logits.

Determinism notes:
  - both models run in eval/deterministic mode (no dropout, no hist dropout)
  - the reference's refine-row sampling (agent_decoder.py:1308-1315) picks
    min(10, #eligible) rows via randperm; the scenario keeps #eligible <= 10
    per step so both sides deterministically select every eligible row
  - neighbor caps (pl2a max 5, refine a2sa max 8) never bind by construction
    (map tokens spaced 12 m, agents spaced >= 6 m), so the repo's nearest-k
    equals the reference's scan-order truncation
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.scenario import build_scenario
from infgen_tpu.model.agent_decoder import AgentDecoder
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from tests import ref_bridge


def _parity_config():
    return Config(
        max_agents=10, max_map_tokens=16, num_token_steps=18,
        hidden_dim=64, num_heads=4, head_dim=16, num_freq_bands=8,
        num_agent_layers=3, num_seed_layers=3, num_map_layers=1,
        num_seed_feature=10, dropout=0.0,
        grid_range=60.0, grid_interval=3.0, pl2seed_radius=30.0,
        a2a_radius=25.0, pl2a_radius=20.0, a2sa_radius=10.0, pl2sa_radius=10.0,
        time_span=60, predict_occ=True, remat_attention=False)


def _parity_scenario(cfg):
    """10 agents, varied enter/exit windows, sparse map (caps never bind)."""
    T10 = 91
    A = 10
    rng = np.random.default_rng(7)
    valid = np.ones((A, T10), bool)
    valid[6, :27] = False    # enters mid-scenario
    valid[7, 62:] = False    # exits
    valid[8, :33] = False
    valid[8, 82:] = False
    pos = np.zeros((A, T10, 2), np.float32)
    heading = np.zeros((A, T10), np.float32)
    vel = np.zeros((A, T10, 2), np.float32)
    t = np.arange(T10, dtype=np.float32) * 0.1
    for a in range(A):
        speed = 1.0 + 0.8 * a                       # m/s
        lane_y = (a % 5) * 6.0 - 12.0               # >= 6 m spacing
        x0 = -20.0 + 4.0 * a
        ang = 0.15 * (a - 4)
        heading[a] = ang + 0.05 * np.sin(t + a)
        pos[a, :, 0] = x0 + speed * t * np.cos(ang)
        pos[a, :, 1] = lane_y + speed * t * np.sin(ang)
        vel[a, :, 0] = speed * np.cos(ang)
        vel[a, :, 1] = speed * np.sin(ang)
    pos += rng.normal(scale=0.05, size=pos.shape).astype(np.float32)
    shape = np.tile(np.array([[4.3, 1.8, 1.5]], np.float32), (A, 1))
    type_ = np.array([0, 0, 0, 1, 0, 2, 0, 0, 1, 0], np.int32)
    agent_arrays = dict(valid=valid, position=pos, heading=heading,
                        velocity=vel, shape=shape, type=type_, av_index=0)

    P = 16
    mp = np.zeros((P, 2), np.float32)
    mp[:, 0] = np.linspace(-40.0, 140.0, P)         # 12 m spacing
    mp[:, 1] = 8.0
    map_arrays = dict(
        position=mp, orientation=np.linspace(-0.3, 0.3, P).astype(np.float32),
        token_idx=rng.integers(0, 1024, P).astype(np.int32),
        pt_type=np.zeros(P, np.int32), pt_side=np.zeros(P, np.int32),
        pl_type=np.zeros(P, np.int32), light_type=np.zeros(P, np.int32),
        chain_id=np.zeros(P, np.int32), chain_pos=np.arange(P, dtype=np.int32))
    return build_scenario(agent_arrays, map_arrays, cfg.max_agents,
                          cfg.max_map_tokens)


@pytest.fixture(scope="module")
def parity_setup():
    cfg = _parity_config()
    scenario = _parity_scenario(cfg)
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    inputs = build_model_inputs(cfg, mt, attr, scenario, jax.random.PRNGKey(0))
    inputs = jax.tree.map(np.asarray, inputs)

    dec = AgentDecoder(cfg, grid_xy=attr.grid, grid_size=attr.grid_size,
                       angle_size=attr.angle_size)
    P, D = cfg.max_map_tokens, cfg.hidden_dim
    x_pt = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (P, D)), np.float32)
    variables = dec.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        inputs, jnp.asarray(x_pt), mt.vocab, scenario.map.position,
        scenario.map.orientation, scenario.map.mask, jax.random.PRNGKey(3),
        deterministic=True)
    out = dec.apply(variables, inputs, jnp.asarray(x_pt), mt.vocab,
                    scenario.map.position, scenario.map.orientation,
                    scenario.map.mask, jax.random.PRNGKey(3),
                    deterministic=True)
    out = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, out)

    ref_dec, _ = ref_bridge.make_ref_decoder(cfg)
    ref_bridge.transplant_agent_decoder(variables["params"], ref_dec, cfg)
    data = ref_bridge.build_ref_data(cfg, scenario, inputs, mt)
    torch.manual_seed(0)
    with torch.no_grad():
        ref_out = ref_dec.forward(data, {"x_pt": torch.from_numpy(x_pt)})
    return cfg, out, ref_out, data


def _cmp(a, t, atol, what):
    a = np.asarray(a, np.float64)
    t = np.asarray(t.detach().numpy(), np.float64)
    assert a.shape == t.shape, f"{what}: {a.shape} vs {t.shape}"
    err = np.abs(a - t).max()
    assert err < atol, f"{what}: max abs err {err:.2e} >= {atol}"


def test_trunk_token_logits(parity_setup):
    """Motion-token head parity. Reference: agent_decoder.py:1201-1221."""
    cfg, out, ref_out, _ = parity_setup
    _cmp(out["next_token_logits"], ref_out["next_token_prob"], 5e-3,
         "next_token_logits")


def test_trunk_state_logits(parity_setup):
    cfg, out, ref_out, _ = parity_setup
    _cmp(out["next_state_logits"], ref_out["next_state_prob"], 5e-3,
         "next_state_logits")


def test_seed_stack_logits(parity_setup):
    """Seed heads parity. Reference: agent_decoder.py:1246-1302."""
    cfg, out, ref_out, _ = parity_setup
    _cmp(out["seed_state_logits"], ref_out["raw_next_state_prob_seed"], 5e-3,
         "seed_state_logits")
    # with A == num_seed_feature == 10, pred_indices is the identity gather
    _cmp(out["seed_type_logits"], ref_out["next_type_prob_seed"], 5e-3,
         "seed_type_logits")
    _cmp(out["seed_shape"], ref_out["next_shape_seed"], 5e-3, "seed_shape")
    _cmp(out["seed_pos_logits"], ref_out["next_pos_rel_prob_seed"], 5e-3,
         "seed_pos_logits")


def test_occ_gt(parity_setup):
    """Occupancy GT built from a2sa edges. Reference: _build_occ_gt."""
    cfg, out, ref_out, data = parity_setup
    ref_occ = data["agent"]["agent_occ"].numpy()
    np.testing.assert_array_equal(np.asarray(out["occ_agent_gt"]), ref_occ)


def test_refine_heads(parity_setup):
    """Heading/offset refine parity on the deterministic mask_sa rows.

    Reference: agent_decoder.py:1304-1385 (eligible rows <= 10/step so the
    randperm selection is exhaustive on both sides).
    """
    cfg, out, ref_out, _ = parity_setup
    mask_repo = np.asarray(out["mask_sa"])
    mask_ref = ref_out["next_head_eval_mask_seed"].numpy()
    np.testing.assert_array_equal(mask_repo, mask_ref)
    m = mask_repo
    _cmp(np.asarray(out["head_logits"])[m],
         ref_out["next_head_rel_prob_seed"][torch.from_numpy(m)], 5e-3,
         "head_logits")
    _cmp(np.asarray(out["offset_xy"])[m],
         ref_out["next_offset_xy_seed"][torch.from_numpy(m)], 5e-3,
         "offset_xy")


def test_detokenize_step_matches_reference_transform(parity_setup):
    """Pinned-token de-quantization: vocab contour -> world pose must match
    the reference rollout math (agent_decoder.py:2176-2211)."""
    cfg, _, _, _ = parity_setup
    mt = MotionTokenizer()
    A = 6
    rng = np.random.default_rng(3)
    token_idx = rng.integers(0, cfg.token_size, A).astype(np.int32)
    type_ = rng.integers(0, 3, A).astype(np.int32)
    prev_pos = rng.normal(scale=20, size=(A, 2)).astype(np.float32)
    prev_head = rng.uniform(-np.pi, np.pi, A).astype(np.float32)

    world = np.asarray(mt.detokenize_step(token_idx, type_, prev_pos, prev_head))

    # reference math in torch
    traj_all = torch.from_numpy(
        np.take(mt.token_traj_all, type_, axis=0)).float()     # [A, V, 6, 4, 2]
    tok = traj_all[torch.arange(A), torch.from_numpy(token_idx).long()]
    theta = torch.from_numpy(prev_head)
    cos, sin = theta.cos(), theta.sin()
    rot = torch.zeros(A, 2, 2)
    rot[:, 0, 0] = cos
    rot[:, 0, 1] = sin
    rot[:, 1, 0] = -sin
    rot[:, 1, 1] = cos
    ref = torch.bmm(tok.reshape(A, -1, 2), rot).reshape(A, 6, 4, 2) \
        + torch.from_numpy(prev_pos)[:, None, None, :]

    np.testing.assert_allclose(world, ref.numpy(), atol=1e-4)
    # pose update: next pos = mean of last contour, heading from corners 0-3
    next_pos = world[:, -1].mean(axis=1)
    d = ref[:, -1, 0] - ref[:, -1, 3]
    next_head_ref = torch.atan2(d[:, 1], d[:, 0]).numpy()
    from infgen_tpu.utils.geometry import heading_from_contour
    next_head = np.asarray(heading_from_contour(jnp.asarray(world[:, -1])))
    np.testing.assert_allclose(next_pos, ref[:, -1].mean(dim=1).numpy(), atol=1e-4)
    np.testing.assert_allclose(next_head, next_head_ref, atol=1e-5)
