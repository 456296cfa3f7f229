"""Next-token targets and evaluation masks.

Vectorized ports of the subtle BOS/EOS mask logic in the reference forward
(agent_decoder.py:1387-1419) and seed-target assembly (:1451-1516).
"""

from typing import Dict

import jax.numpy as jnp

from infgen_tpu.config import ENTER_STATE, EXIT_STATE


def roll_targets(token_idx, state_idx):
    """next_token / next_state GT = roll(-1) (agent_decoder.py:1221,1227).

    State GT remaps exit(3) -> class 2 of the 3-way {invalid, valid, exit}
    head (:1518).
    """
    next_token = jnp.roll(token_idx, -1, axis=1)
    next_state = jnp.roll(state_idx, -1, axis=1)
    next_state = jnp.where(next_state == EXIT_STATE, 2, next_state)
    return next_token, next_state


def token_state_eval_masks(raw_valid, state_idx, av_index, slot_mask):
    """(token_mask, state_mask) [A, T] bool.

    Vectorization of agent_decoder.py:1387-1419:
      base   = m & roll(m,-1) & roll(m,+1)
      bos tb : token[tb]=1, token[tb+1]=m[tb+2]  (no-op when tb+2 == T)
               state[:tb]=0, state[tb]=1, state[tb+1]=m[tb+2]
      eos te : token[te]=0
               state[te+1:]=1, state[te]=m[te-1]
      both   : [:,0]=m0&m1, [:,-1]=0;  state[av]=0
    """
    A, T = state_idx.shape
    m = raw_valid
    mf = jnp.roll(m, -1, axis=1)
    mb = jnp.roll(m, 1, axis=1)
    base = m & mf & mb

    is_bos = state_idx == ENTER_STATE
    is_eos = state_idx == EXIT_STATE
    t = jnp.arange(T)[None]
    has_bos = is_bos.any(1)
    has_eos = is_eos.any(1)
    bos = jnp.where(has_bos, jnp.argmax(is_bos, 1), T)   # T = "never"
    eos = jnp.where(has_eos, jnp.argmax(is_eos, 1), T)

    after_bos = has_bos[:, None] & (t == (bos + 1)[:, None]) & (t < T)
    # m[tb+2] seen from position tb+1 is roll(m, -1); tb+1 == T-1 keeps base
    tok = base
    tok = jnp.where(is_bos, True, tok)
    tok = jnp.where(after_bos & (t < T - 1), mf, tok)
    tok = jnp.where(is_eos, False, tok)

    st = base
    st = jnp.where(has_bos[:, None] & (t < bos[:, None]), False, st)
    st = jnp.where(is_bos, True, st)
    st = jnp.where(after_bos & (t < T - 1), mf, st)
    st = jnp.where(has_eos[:, None] & (t > eos[:, None]), True, st)
    st = jnp.where(is_eos & (t > 0), mb, st)

    first = (m[:, 0] & m[:, 1])[:, None]
    tok = tok.at[:, 0].set(first[:, 0])
    st = st.at[:, 0].set(first[:, 0])
    tok = tok.at[:, -1].set(False)
    st = st.at[:, -1].set(False)
    st = st.at[av_index].set(False)  # no state supervision for ego (:1511)

    tok = tok & slot_mask[:, None]
    st = st & slot_mask[:, None]
    return tok, st


def seed_targets(inputs, grid_size: int, num_seed: int) -> Dict[str, jnp.ndarray]:
    """Seed supervision via ego-angle-sorted matching (agent_decoder.py:1451-1516).

    Seed slot s is matched to the agent at insertion-order position s
    (sort_indices[s, t]); slots are 'enter' where that agent enters, else
    'invalid'. Attribute losses apply only at actual enter events outside the
    ego cell and not at t=0.
    Returns gathered GT arrays of leading shape [S, T].
    """
    tok = inputs.tokens
    S = num_seed
    gt_idx = inputs.sort_indices[:S]                       # [S, T] agent ids

    take = lambda x: jnp.take_along_axis(x, gt_idx, axis=0)
    state_g = take(tok.state_idx)
    seed_state_gt = (state_g == ENTER_STATE).astype(jnp.int32)  # enter=1 / invalid=0

    type_gt = inputs.agent_type[gt_idx]                    # [S, T]
    shape_gt = inputs.agent_shape[gt_idx]                  # [S, T, 3]
    pos_idx_gt = take(inputs.grid_token_idx)               # [S, T]
    pos_xy_gt = jnp.take_along_axis(
        inputs.pos_xy, gt_idx[..., None], axis=0)          # [S, T, 2]

    attr_mask = (state_g == ENTER_STATE)
    attr_mask = attr_mask.at[:, 0].set(False)
    attr_mask = attr_mask & (pos_idx_gt != grid_size // 2)

    state_mask = jnp.ones_like(seed_state_gt, bool).at[:, 0].set(False)

    return dict(
        seed_state_gt=seed_state_gt,
        seed_state_mask=state_mask,
        seed_type_gt=type_gt,
        seed_shape_gt=shape_gt,
        seed_pos_idx_gt=pos_idx_gt,
        seed_pos_xy_gt=pos_xy_gt,
        seed_attr_mask=attr_mask,
    )
