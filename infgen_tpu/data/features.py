"""Model-input preparation: tokenize a Scenario into fixed-shape model inputs.

Replaces the reference's per-batch python chain in training_step
(model/infgen.py:253-259): TokenProcessor -> match_token_map ->
sample_pt_pred -> _fetch_enterings. Everything here is vectorized jnp and
jit-safe; it runs on device as the first stage of the train step.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from infgen_tpu.config import Config, ENTER_STATE, INVALID_STATE
from infgen_tpu.data.scenario import Scenario
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer, TokenizedAgents
from infgen_tpu.utils.geometry import angle_between_2d_vectors, wrap_angle


class ModelInputs(NamedTuple):
    """Everything the decoder consumes for one scenario. T token steps."""

    # motion/state tokens (MotionTokenizer output)
    tokens: TokenizedAgents
    # ego-relative grid tokenization (_fetch_enterings, model/infgen.py:1008-1128)
    grid_token_idx: jnp.ndarray     # [A, T] int32, -1 out-of-range/invalid
    grid_offset_xy: jnp.ndarray     # [A, T, 2]
    heading_token_idx: jnp.ndarray  # [A, T] int32
    pos_xy: jnp.ndarray             # [A, T, 2] ego-relative raw offset
    heading_theta: jnp.ndarray      # [A, T] wrapped rel heading
    sort_indices: jnp.ndarray       # [A, T] int32 ego-angle argsort of entering agents
    inrange_mask: jnp.ndarray       # [A, T] bool
    bos_mask: jnp.ndarray           # [A, T] bool
    pt_grid_token_idx: jnp.ndarray  # [T, P] int32 map-token grid cells, -1 outside
    ego_pos: jnp.ndarray            # [T, 2]
    ego_head: jnp.ndarray           # [T]
    # agent statics
    agent_shape: jnp.ndarray        # [A, 3]
    agent_type: jnp.ndarray         # [A]
    av_index: jnp.ndarray           # []
    slot_mask: jnp.ndarray          # [A]
    train_mask: jnp.ndarray         # [A]
    # map-token prediction masks (sample_pt_pred, model/infgen.py:986-1006)
    pt_valid_mask: jnp.ndarray      # [P] bool
    pt_pred_mask: jnp.ndarray       # [P] bool
    pt_target_mask: jnp.ndarray     # [P] bool
    pt_next_token_idx: jnp.ndarray  # [P] int32 successor token id (-1 none)


def fetch_enterings(attr: AttrTokenizer, cfg: Config, tokens: TokenizedAgents,
                    av_index, pt_pos, pt_mask):
    """Vectorized _fetch_enterings (model/infgen.py:1008-1128).

    Per token step: ego-relative grid/heading tokens for all agents, in-range
    masks, and the ego-angle ordering of entering agents used as seed GT.
    """
    pos_a = tokens.token_pos           # [A, T, 2]
    head_a = tokens.token_heading      # [A, T]
    state = tokens.state_idx           # [A, T]
    A, T = state.shape

    ego_pos = pos_a[av_index]          # [T, 2]
    ego_head = head_a[av_index]        # [T]

    is_bos = state == ENTER_STATE
    is_invalid = state == INVALID_STATE
    rel = pos_a - ego_pos[None]                      # [A, T, 2]
    dist = jnp.linalg.norm(rel, axis=-1)
    inrange = dist <= cfg.pl2seed_radius

    sel = (~is_invalid) & inrange

    def encode_step(x_t, ego_pos_t, ego_head_t):
        return attr.encode_pos(x_t, ego_pos_t[None], ego_head_t)

    grid_idx, offset_xy = jax.vmap(encode_step, in_axes=(1, 0, 0), out_axes=(1, 1))(
        pos_a, ego_pos, ego_head
    )
    grid_token_idx = jnp.where(sel, grid_idx, -1).astype(jnp.int32)
    grid_offset_xy = jnp.where(sel[..., None], offset_xy, 0.0)
    pos_xy = jnp.where(sel[..., None], rel, 0.0)

    rel_heading = head_a - ego_head[None]
    heading_token_idx = attr.encode_heading(rel_heading)
    heading_theta = wrap_angle(rel_heading)

    # ego-angle sort of entering agents (model/infgen.py:1058-1065)
    head_vec = jnp.stack([jnp.cos(ego_head), jnp.sin(ego_head)], axis=-1)  # [T, 2]
    ang = angle_between_2d_vectors(head_vec[None], rel)                    # [A, T]
    ang = jnp.where(is_bos & inrange, ang, jnp.inf)
    order = jnp.argsort(ang, axis=0)                                       # [A, T]
    sorted_vals = jnp.take_along_axis(ang, order, axis=0)
    sort_indices = jnp.where(jnp.isinf(sorted_vals), av_index, order).astype(jnp.int32)

    # map tokens on the ego grid (model/infgen.py:1071-1077)
    pt_dist = jnp.linalg.norm(pt_pos[None] - ego_pos[:, None], axis=-1)    # [T, P]
    pt_inrange = (pt_dist <= cfg.pl2seed_radius) & pt_mask[None]

    def encode_pt_step(ego_pos_t, ego_head_t):
        idx, _ = attr.encode_pos(pt_pos, ego_pos_t[None], ego_head_t)
        return idx

    pt_grid = jax.vmap(encode_pt_step)(ego_pos, ego_head)                  # [T, P]
    pt_grid_token_idx = jnp.where(pt_inrange, pt_grid, -1).astype(jnp.int32)

    return dict(
        grid_token_idx=grid_token_idx, grid_offset_xy=grid_offset_xy,
        heading_token_idx=heading_token_idx, pos_xy=pos_xy,
        heading_theta=heading_theta, sort_indices=sort_indices,
        inrange_mask=inrange, bos_mask=is_bos,
        pt_grid_token_idx=pt_grid_token_idx, ego_pos=ego_pos, ego_head=ego_head,
    )


def sample_pt_pred_masks_device(chain_id, chain_pos, mask, rng, token_idx=None):
    """Device-side random map-token masking (sample_pt_pred equivalent).

    Masks ~1/3 of each chain's non-initial tokens; pred site = unmasked token
    whose successor (same chain, chain_pos+1) was masked; target = successor.
    With `token_idx`, also returns each position's successor token id
    (`next_token_idx`, -1 where no successor) for the map-token CE loss.
    """
    P = chain_id.shape[0]
    drop = (jax.random.uniform(rng, (P,)) < (1.0 / 3.0)) & (chain_pos > 0) & mask
    pt_valid = mask & ~drop

    # successor lookup: token j is the successor of i iff same chain, pos+1.
    same_chain = (chain_id[:, None] == chain_id[None, :]) & (chain_id[:, None] >= 0)
    succ = same_chain & (chain_pos[None, :] == chain_pos[:, None] + 1)      # [P, P]
    succ_dropped = (succ & drop[None, :]).any(axis=1)
    pt_pred = pt_valid & succ_dropped
    pt_target = (succ.T & pt_pred[None, :]).any(axis=1) & drop
    if token_idx is None:
        return pt_valid, pt_pred, pt_target
    succ_idx = jnp.argmax(succ, axis=1)
    has_succ = succ.any(axis=1)
    next_token_idx = jnp.where(has_succ, token_idx[succ_idx], -1)
    return pt_valid, pt_pred, pt_target, next_token_idx


def build_model_inputs(cfg: Config, motion_tok: MotionTokenizer, attr: AttrTokenizer,
                       scenario: Scenario, rng) -> ModelInputs:
    """Full input chain for one scenario (jit-safe)."""
    ag = scenario.agents
    tokens = motion_tok.tokenize(ag.valid, ag.position, ag.heading, ag.velocity, ag.type)
    ent = fetch_enterings(attr, cfg, tokens, ag.av_index,
                          scenario.map.position, scenario.map.mask)
    rng_map, _ = jax.random.split(rng)
    pt_valid, pt_pred, pt_target, pt_next = sample_pt_pred_masks_device(
        scenario.map.chain_id, scenario.map.chain_pos, scenario.map.mask, rng_map,
        token_idx=scenario.map.token_idx)
    return ModelInputs(
        tokens=tokens,
        agent_shape=ag.shape,
        agent_type=ag.type,
        av_index=ag.av_index,
        slot_mask=ag.slot_mask,
        train_mask=ag.train_mask & ag.slot_mask,
        pt_valid_mask=pt_valid, pt_pred_mask=pt_pred, pt_target_mask=pt_target,
        pt_next_token_idx=pt_next,
        **ent,
    )
