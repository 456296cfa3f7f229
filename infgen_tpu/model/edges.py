"""Dense mask / relative-geometry builders for the agent decoder.

Pure jnp functions replacing the reference's sparse edge builders
(agent_decoder.py:540-931). Each returns a boolean attention mask plus the
raw relative-geometry features that get Fourier-embedded by the decoder.

Convention: masks are indexed [batch..., query, key] with True = attend.
"sentinel" handling of invalid steps follows agent_decoder.py:591-601:
  key invalid, query valid   -> rel_pos = -motion_gap, rel_head = -heading_gap
  key valid,   query invalid -> rel_pos = +motion_gap, rel_head unchanged
  both invalid               -> rel_pos = invalid_motion, rel_head = invalid_head
(The reference's `rel_head = +heading_gap` branch is dead code due to a `==`
typo at agent_decoder.py:598, so rel_head passes through raw in that case.
We reproduce the *actual* trained behavior, not the apparent intent — proven
equivalent by tests/test_ref_parity.py with transplanted weights.)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from infgen_tpu.config import ENTER_STATE, EXIT_STATE, INVALID_STATE
from infgen_tpu.utils.geometry import angle_between_2d_vectors, wrap_angle

MOTION_GAP = 1.0
HEADING_GAP = 1.0
INVALID_MOTION_VALUE = -2.0
INVALID_HEAD_VALUE = -2.0


def build_motion_vectors(pos, head, state):
    """Per-step motion vector with invalid-transition sentinels.

    pos [A, T, 2]; head [A, T]; state [A, T].
    Reference: _build_vector_a (agent_decoder.py:426-447). Note the reference's
    heading overwrite at :444 is a `==` no-op; headings pass through unchanged.
    Returns (motion_vector [A, T, 2], head_vector [A, T, 2]).
    """
    motion = jnp.concatenate([jnp.zeros_like(pos[:, :1]), pos[:, 1:] - pos[:, :-1]], axis=1)
    is_invalid = state == INVALID_STATE
    motion = jnp.where(is_invalid[..., None], INVALID_MOTION_VALUE, motion)

    prev_invalid = jnp.roll(is_invalid, 1, axis=1)
    became_valid = prev_invalid & ~is_invalid
    became_valid = became_valid.at[:, 0].set(state[:, 0] == ENTER_STATE)
    motion = jnp.where(became_valid[..., None], MOTION_GAP, motion)

    became_invalid = ~prev_invalid & is_invalid
    became_invalid = became_invalid.at[:, 0].set(False)
    motion = jnp.where(became_invalid[..., None], -MOTION_GAP, motion)

    head_vector = jnp.stack([jnp.cos(head), jnp.sin(head)], axis=-1)
    return motion, head_vector


def _apply_invalid_sentinels(rel_pos, rel_head, inv_key, inv_query):
    """inv_key/inv_query broadcastable to rel_head's shape."""
    rel_pos = jnp.where((inv_key & ~inv_query)[..., None], -MOTION_GAP, rel_pos)
    rel_pos = jnp.where((~inv_key & inv_query)[..., None], MOTION_GAP, rel_pos)
    rel_head = jnp.where(inv_key & ~inv_query, -HEADING_GAP, rel_head)
    # NOTE: no rel_head rewrite for (valid key, invalid query) — the
    # reference's assignment is dead code (`==` typo, agent_decoder.py:598)
    both = inv_key & inv_query
    rel_pos = jnp.where(both[..., None], INVALID_MOTION_VALUE, rel_pos)
    rel_head = jnp.where(both, INVALID_HEAD_VALUE, rel_head)
    return rel_pos, rel_head


class TemporalEdges(NamedTuple):
    mask: jnp.ndarray   # [A, Tq, Tk] bool
    r_raw: jnp.ndarray  # [A, Tq, Tk, 4]


def build_temporal_edges(pos, head, state, head_vector, hist_mask,
                         time_span_steps: int, query_mask=None) -> TemporalEdges:
    """Per-agent causal-window temporal attention.

    hist_mask [A, T]: attendable key steps (after bos clamp / random dropout).
    query_mask [A, T]: optional restriction of query steps (inference).
    Reference: _build_temporal_edge (agent_decoder.py:540-610).
    """
    A, T = state.shape
    q_mask = hist_mask if query_mask is None else query_mask
    tq = jnp.arange(T)
    window = (tq[:, None] - tq[None, :] > 0) & (tq[:, None] - tq[None, :] <= time_span_steps)
    mask = hist_mask[:, None, :] & q_mask[:, :, None] & window[None]

    rel_pos = pos[:, None, :, :] - pos[:, :, None, :]               # [A, Tq, Tk, 2] key - query
    rel_head = wrap_angle(head[:, None, :] - head[:, :, None])
    inv = state == INVALID_STATE
    rel_pos, rel_head = _apply_invalid_sentinels(
        rel_pos, rel_head, inv[:, None, :], inv[:, :, None])

    r = jnp.stack([
        jnp.linalg.norm(rel_pos, axis=-1),
        angle_between_2d_vectors(head_vector[:, :, None, :], rel_pos),
        rel_head,
        (tq[None, :] - tq[:, None])[None].repeat(A, 0).astype(pos.dtype),  # key - query
    ], axis=-1)
    return TemporalEdges(mask=mask, r_raw=r)


class StepEdges(NamedTuple):
    mask: jnp.ndarray   # [T, Q, K] bool
    r_raw: jnp.ndarray  # [T, Q, K, 3]


def build_a2a_edges(pos, head, state, head_vector, node_mask, radius: float,
                    query_mask=None, key_mask=None) -> StepEdges:
    """Agent-agent attention per step within `radius`.

    pos [A, T, 2] etc.; node_mask [A, T] (interact mask; applied to both
    sides). Reference: _build_interaction_edge (agent_decoder.py:612-681);
    the 300-neighbor cap never binds at A<=128, so the dense mask is exact.
    Returns arrays in [T, A(query), A(key)] layout.
    """
    pos_t = pos.swapaxes(0, 1)         # [T, A, 2]
    head_t = head.swapaxes(0, 1)       # [T, A]
    hv_t = head_vector.swapaxes(0, 1)
    nm_t = node_mask.swapaxes(0, 1)
    qm = nm_t if query_mask is None else query_mask.swapaxes(0, 1)
    km = nm_t if key_mask is None else key_mask.swapaxes(0, 1)

    d2 = ((pos_t[:, :, None] - pos_t[:, None, :]) ** 2).sum(-1)    # [T, Aq, Ak]
    A = pos.shape[0]
    mask = (d2 <= radius * radius) & ~jnp.eye(A, dtype=bool)[None]
    mask = mask & km[:, None, :] & qm[:, :, None]

    rel_pos = pos_t[:, None, :, :] - pos_t[:, :, None, :]          # key - query
    rel_head = wrap_angle(head_t[:, None, :] - head_t[:, :, None])
    inv = (state == INVALID_STATE).swapaxes(0, 1)
    rel_pos, rel_head = _apply_invalid_sentinels(
        rel_pos, rel_head, inv[:, None, :], inv[:, :, None])

    r = jnp.stack([
        jnp.linalg.norm(rel_pos, axis=-1),
        angle_between_2d_vectors(hv_t[:, :, None, :], rel_pos),
        rel_head,
    ], axis=-1)
    return StepEdges(mask=mask, r_raw=r)


class GatherEdges(NamedTuple):
    idx: jnp.ndarray    # [A, T, k] neighbor indices into the key set
    mask: jnp.ndarray   # [A, T, k]
    r_raw: jnp.ndarray  # [A, T, k, 3]


def build_pl2a_edges(pos, head, state, head_vector, query_mask,
                     pt_pos, pt_orient, pt_mask, radius: float, k: int) -> GatherEdges:
    """Map->agent: k nearest map tokens within `radius` per (agent, step).

    Reference: _build_map2agent_edge (agent_decoder.py:683-758) with
    max_num_neighbors=5; we take the 5 *closest* (the CUDA kernel's pick is
    arbitrary). Invalid-query steps get sentinel geometry (:722-723).
    """
    from infgen_tpu.ops.neighbors import topk_neighbors

    A, T, _ = pos.shape
    k = min(k, pt_pos.shape[0])  # topk_neighbors caps k at the key count
    flat_pos = pos.reshape(A * T, 2)
    idx, valid = topk_neighbors(flat_pos, pt_pos, k, radius, key_mask=pt_mask)
    idx = idx.reshape(A, T, k)
    valid = valid.reshape(A, T, k) & query_mask[..., None]

    rel_pos = pt_pos[idx] - pos[:, :, None, :]
    rel_orient = wrap_angle(pt_orient[idx] - head[:, :, None])
    inv = state == INVALID_STATE
    rel_pos = jnp.where(inv[..., None, None], MOTION_GAP, rel_pos)
    rel_orient = jnp.where(inv[..., None], HEADING_GAP, rel_orient)

    r = jnp.stack([
        jnp.linalg.norm(rel_pos, axis=-1),
        angle_between_2d_vectors(head_vector[:, :, None, :], rel_pos),
        rel_orient,
    ], axis=-1)
    return GatherEdges(idx=idx, mask=valid, r_raw=r)


def build_a2sa_edges(pos, head, state, head_vector, key_mask,
                     seed_pos, seed_head, seed_head_vector, radius: float,
                     seq_mask=None) -> StepEdges:
    """Agents -> seed queries per step within `radius` of the seed.

    pos [A, T, 2]; seed_pos [S, T, 2] (training: ego replicated).
    seq_mask [T, S, A] optional autoregressive-insertion-order mask.
    Reference: _build_a2sa_edge insert mode (agent_decoder.py:760-849).
    Layout: [T, S(query), A(key)].
    """
    pos_k = pos.swapaxes(0, 1)          # [T, A, 2]
    head_k = head.swapaxes(0, 1)
    sp = seed_pos.swapaxes(0, 1)        # [T, S, 2]
    sh = seed_head.swapaxes(0, 1)
    shv = seed_head_vector.swapaxes(0, 1)

    d2 = ((sp[:, :, None] - pos_k[:, None, :]) ** 2).sum(-1)       # [T, S, A]
    mask = (d2 <= radius * radius) & key_mask.swapaxes(0, 1)[:, None, :]
    if seq_mask is not None:
        mask = mask & seq_mask

    rel_pos = pos_k[:, None, :, :] - sp[:, :, None, :]
    rel_head = wrap_angle(head_k[:, None, :] - sh[:, :, None])
    # seeds are invalid-state queries attending valid keys: the reference
    # computes raw geometry here (no sentinel rewrite on the seed side)
    r = jnp.stack([
        jnp.linalg.norm(rel_pos, axis=-1),
        angle_between_2d_vectors(shv[:, :, None, :], rel_pos),
        rel_head,
    ], axis=-1)
    return StepEdges(mask=mask, r_raw=r)


def build_pl2sa_edges(seed_pos, seed_head, seed_head_vector,
                      pt_pos, pt_orient, pt_mask, radius: float):
    """Map -> seed keys per step; all seeds share the key mask & geometry.

    seed_pos here is the *ego* trajectory [T, 2] (all training seeds sit on
    ego: _pad_feat, agent_decoder.py:511-526). Returns (mask [T, P],
    r_raw [T, P, 3]) — query-independent, broadcast over the seed axis.
    Reference: _build_map2sa_edge (agent_decoder.py:851-904).
    """
    d2 = ((seed_pos[:, None, :] - pt_pos[None]) ** 2).sum(-1)      # [T, P]
    mask = (d2 <= radius * radius) & pt_mask[None]
    rel_pos = pt_pos[None] - seed_pos[:, None, :]
    rel_orient = wrap_angle(pt_orient[None] - seed_head[:, None])
    r = jnp.stack([
        jnp.linalg.norm(rel_pos, axis=-1),
        angle_between_2d_vectors(seed_head_vector[:, None, :], rel_pos),
        rel_orient,
    ], axis=-1)
    return mask, r


def build_seq_mask(sort_indices, av_index, num_seed: int, num_agents: int):
    """Autoregressive insertion-order mask for seed queries.

    sort_indices [A, T]: entering agents by ego angle, padded with av_index.
    seq_mask[t, s, a] = True iff seed s may attend agent a at step t:
    agents at insertion order < s, every non-entering agent, and the AV.
    Reference: _build_seq (agent_decoder.py:994-1054) with seed_attn_to_av.
    Returns [T, S, A] bool.
    """
    A, T = sort_indices.shape
    S = num_seed
    # blocked[a, s, t]: a appears in sort_indices[s:, t]
    onehot = jax.nn.one_hot(sort_indices, num_agents, dtype=jnp.float32)   # [A(order), T, A(agent)]
    # suffix-sum over the order axis: order positions >= s
    suffix = jnp.flip(jnp.cumsum(jnp.flip(onehot, 0), axis=0), 0)          # [A, T, A]
    blocked = suffix[:S] > 0                                               # [S, T, A]
    mask = ~blocked
    mask = mask.transpose(1, 0, 2)                                         # [T, S, A]
    mask = mask.at[:, :, av_index].set(True)
    return mask


def training_hist_mask(raw_valid, state, rng=None, num_drop: int = 10):
    """Temporal key mask for training.

    Base: ones outside the motion window, raw validity inside (forward:
    agent_decoder.py:1152-1156); then clamp t >= bos (temporal_attn_to_invalid
    =False, :546-551); then drop `num_drop` random steps per agent (:575-577).
    """
    A, T = state.shape
    is_bos = state == ENTER_STATE
    is_eos = state == EXIT_STATE
    bos = jnp.where(is_bos.any(1), jnp.argmax(is_bos, 1), 0)
    eos = jnp.where(is_eos.any(1), jnp.argmax(is_eos, 1), T - 1)
    t = jnp.arange(T)[None]
    motion_win = (t > bos[:, None]) & (t <= eos[:, None])
    hist = jnp.where(motion_win, raw_valid, True)
    hist = hist & (t >= bos[:, None])
    if rng is not None:
        drop = jax.random.randint(rng, (A, num_drop), 0, T)
        drop_oh = jax.nn.one_hot(drop, T, dtype=bool).any(axis=1)
        hist = hist & ~drop_oh
    return hist
