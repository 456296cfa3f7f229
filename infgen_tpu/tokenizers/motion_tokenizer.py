"""Motion / state tokenizer: 10 Hz trajectories -> 2 Hz motion + state tokens.

TPU-native port of the reference `TokenProcessor._tokenize_agent`
(infgen/datasets/preprocess.py:236-691). The greedy sequential contour
matching (preprocess.py:552-691) chains agent pose through previously matched
tokens, so it is expressed as a `jax.lax.scan` over token steps; everything
else (heading cleanup, extrapolation, state derivation) is vectorized with
masks instead of the reference's python loops.

All functions are jit-able and operate on fixed-shape padded arrays:
    valid:   [A, T10]  bool    (T10 = 91 raw 10 Hz steps)
    pos:     [A, T10, 2]
    heading: [A, T10]
    vel:     [A, T10, 2]
    type_:   [A] int (0 veh / 1 ped / 2 cyc)
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.config import ENTER_STATE, EXIT_STATE, INVALID_STATE, SHIFT, VALID_STATE
from infgen_tpu.tokenizers.vocab import load_agent_vocab
from infgen_tpu.utils.geometry import cal_polygon_contour, heading_from_contour, rot_mat_2d, wrap_angle


class TokenizedAgents(NamedTuple):
    """Fixed-shape tokenization output. T = T10 // SHIFT token steps."""

    token_idx: jnp.ndarray        # [A, T] int32; -1 invalid, -2 enter(bos)
    state_idx: jnp.ndarray        # [A, T] int32 in {invalid, valid, enter, exit}
    token_pos: jnp.ndarray        # [A, T, 2] contour centroid (or raw pos at bos)
    token_heading: jnp.ndarray    # [A, T]
    token_contour: jnp.ndarray    # [A, T, 4, 2]
    token_valid: jnp.ndarray      # [A, T] bool (enter steps forced False)
    raw_token_valid: jnp.ndarray  # [A, T] bool (pre state adjustment)


def clean_heading(valid, heading):
    """Suppress >1.5 rad single-step heading jumps by forward-filling.

    Sequential over time (each fix feeds the next comparison):
    reference preprocess.py:317-324.
    """
    valid_pairs = valid[:, :-1] & valid[:, 1:]

    def step(h_prev, xs):
        h_next, vp = xs
        diff = jnp.abs(wrap_angle(h_prev - h_next))
        fixed = jnp.where((diff > 1.5) & vp, h_prev, h_next)
        return fixed, fixed

    _, rest = jax.lax.scan(
        step, heading[:, 0], (heading[:, 1:].swapaxes(0, 1), valid_pairs.swapaxes(0, 1))
    )
    return jnp.concatenate([heading[:, :1], rest.swapaxes(0, 1)], axis=1)


def extrapolate_to_prev_token_step(valid, pos, heading, vel, current_step: int = 10):
    """Back-extrapolate each agent so its first valid step lands on a token boundary.

    Vectorized port of preprocess.py:326-344: for first valid step t, fill the
    preceding `t % SHIFT` steps (or SHIFT steps when t == current_step and the
    previous boundary is invalid) with constant-velocity backward rollout.
    """
    A, T = valid.shape
    first = jnp.argmax(valid, axis=1)  # first True step (0 if none valid)
    any_valid = valid.any(axis=1)
    n_extra = first % SHIFT
    special = (first == current_step) & (~valid[:, current_step - SHIFT]) & any_valid
    n_extra = jnp.where(special, SHIFT, n_extra)
    n_extra = jnp.where(any_valid, n_extra, 0)

    steps = jnp.arange(T)[None, :]                       # [1, T]
    fill = (steps >= (first - n_extra)[:, None]) & (steps < first[:, None])

    vel_t = jnp.take_along_axis(vel, first[:, None, None], axis=1)        # [A,1,2]
    head_t = jnp.take_along_axis(heading, first[:, None], axis=1)         # [A,1]
    pos_t = jnp.take_along_axis(pos, first[:, None, None], axis=1)        # [A,1,2]

    k = (first[:, None] - steps).astype(pos.dtype)       # distance back from t
    extrap_pos = pos_t - k[..., None] * vel_t * 0.1

    valid = valid | fill
    pos = jnp.where(fill[..., None], extrap_pos, pos)
    heading = jnp.where(fill, head_t, heading)
    vel = jnp.where(fill[..., None], vel_t, vel)
    return valid, pos, heading, vel


def matching_agent_shape(type_):
    """Width/length used for contour matching. Reference: preprocess.py:346-354."""
    width = jnp.where(type_ == 0, 2.0, 1.0)
    length = jnp.where(type_ == 0, 4.8, jnp.where(type_ == 1, 2.0, 1.0))
    return jnp.stack([width, length], axis=-1)


@jax.jit
def _match_scan(valid, pos, heading, shape_wl, token_traj):
    """Greedy sequential contour matching. Reference: preprocess.py:552-691.

    token_traj: [A, V, 4, 2] per-agent (type-selected) final-step vocab contours
    in the local frame. Pose chains through matched tokens, so this is a scan
    over token steps. Returns (token_idx [A, T], token_contour [A, T, 4, 2]).
    """
    A, T10 = valid.shape

    def step(carry, i):
        prev_pos, prev_heading = carry

        v0 = jnp.take_along_axis(valid, (i - SHIFT)[None, None], axis=1)[:, 0]
        v1 = jnp.take_along_axis(valid, i[None, None], axis=1)[:, 0]
        _valid = v0 & v1

        rot = rot_mat_2d(prev_heading)                      # [A, 2, 2]
        world = jnp.einsum("avcj,ajk->avck", token_traj, rot) + prev_pos[:, None, None, :]

        pos_i = jnp.take_along_axis(pos, i[None, None, None], axis=1)[:, 0]       # [A,2]
        head_i = jnp.take_along_axis(heading, i[None, None], axis=1)[:, 0]        # [A]
        cur_contour = cal_polygon_contour(pos_i, head_i, shape_wl)                # [A,4,2]

        d = jnp.linalg.norm(world - cur_contour[:, None], axis=-1).sum(-1)        # [A,V]
        idx = jnp.argmin(d, axis=-1)                                              # [A]
        contour = jnp.take_along_axis(world, idx[:, None, None, None], axis=1)[:, 0]  # [A,4,2]

        matched_heading = heading_from_contour(contour)
        new_prev_heading = jnp.where(_valid, matched_heading, head_i)
        new_prev_pos = jnp.where(_valid[:, None], contour.mean(axis=1), pos_i)

        return (new_prev_pos, new_prev_heading), (idx.astype(jnp.int32), contour)

    steps = jnp.arange(SHIFT, T10, SHIFT)
    (_, _), (token_idx, token_contour) = jax.lax.scan(
        step, (pos[:, 0], heading[:, 0]), steps
    )
    return token_idx.swapaxes(0, 1), token_contour.swapaxes(0, 1)


def derive_state_tokens(token_valid):
    """State tokens from token-level validity. Reference: preprocess.py:433-442.

    token_valid: [A, T] bool. Returns int32 [A, T].
    """
    A, T = token_valid.shape
    tv = token_valid.astype(jnp.int32)
    bos = jnp.argmax(tv, axis=1)
    eos = T - 1 - jnp.argmax(jnp.flip(tv, axis=1), axis=1)
    steps = jnp.arange(T)[None, :]
    state = jnp.full((A, T), VALID_STATE, dtype=jnp.int32)
    state = jnp.where(steps == bos[:, None], ENTER_STATE, state)
    state = jnp.where(steps == eos[:, None], EXIT_STATE, state)
    state = jnp.where((steps < bos[:, None]) | (steps > eos[:, None]), INVALID_STATE, state)
    # last-step exit converts back to valid (preprocess.py:441-442)
    last_exit = state[:, -1] == EXIT_STATE
    state = state.at[:, -1].set(jnp.where(last_exit, VALID_STATE, state[:, -1]))
    # agents with no valid tokens at all are fully invalid
    state = jnp.where(token_valid.any(axis=1)[:, None], state, INVALID_STATE)
    return state


class MotionTokenizer:
    """End-to-end agent tokenization pipeline with a fixed vocab.

    Equivalent of the reference TokenProcessor for the agent stream
    (preprocess.py:364-550); map tokenization lives in map_tokenizer.py.
    """

    def __init__(self, vocab=None, current_step: int = 10):
        self.vocab = vocab if vocab is not None else load_agent_vocab()
        # host-side numpy (jit constant): [3, V, 6, 4, 2] stacked veh/ped/cyc
        self.token_traj_all = np.stack(
            [np.asarray(self.vocab["veh"]), np.asarray(self.vocab["ped"]),
             np.asarray(self.vocab["cyc"])], axis=0
        )
        self.token_traj = self.token_traj_all[:, :, -1]  # [3, V, 4, 2]
        self.current_step = current_step

    def __call__(self, valid, pos, heading, vel, type_) -> TokenizedAgents:
        return self.tokenize(valid, pos, heading, vel, type_)

    @partial(jax.jit, static_argnums=(0,))
    def tokenize(self, valid, pos, heading, vel, type_) -> TokenizedAgents:
        A, T10 = valid.shape
        heading = clean_heading(valid, heading)
        valid, pos, heading, vel = extrapolate_to_prev_token_step(
            valid, pos, heading, vel, self.current_step
        )
        shape_wl = matching_agent_shape(type_)
        per_agent_vocab = jnp.asarray(self.token_traj)[jnp.clip(type_, 0, 2)]  # [A, V, 4, 2]

        token_idx, token_contour = _match_scan(valid, pos, heading, shape_wl, per_agent_vocab)

        # token-level validity: both boundary steps valid (preprocess.py:391-392)
        T = T10 // SHIFT
        v0 = valid[:, 0:T10 - SHIFT:SHIFT][:, :T]
        v1 = valid[:, SHIFT::SHIFT][:, :T]
        raw_token_valid = v0 & v1

        state_idx = derive_state_tokens(raw_token_valid)

        token_pos = token_contour.mean(axis=2)
        token_heading = heading_from_contour(token_contour)

        # state-conditioned fixups (preprocess.py:444-453)
        token_valid = raw_token_valid & (state_idx != ENTER_STATE)
        is_invalid = state_idx == INVALID_STATE
        token_pos = jnp.where(is_invalid[..., None], 0.0, token_pos)
        token_heading = jnp.where(is_invalid, 0.0, token_heading)
        is_bos = state_idx == ENTER_STATE
        raw_pos_at_boundary = pos[:, SHIFT::SHIFT][:, :T]  # pos at step (j+1)*SHIFT
        token_pos = jnp.where(is_bos[..., None], raw_pos_at_boundary, token_pos)
        token_idx = jnp.where(is_invalid, -1, token_idx)
        token_idx = jnp.where(is_bos, -2, token_idx)

        return TokenizedAgents(
            token_idx=token_idx,
            state_idx=state_idx,
            token_pos=token_pos,
            token_heading=token_heading,
            token_contour=token_contour,
            token_valid=token_valid,
            raw_token_valid=raw_token_valid,
        )

    def detokenize_step(self, token_idx, type_, prev_pos, prev_heading):
        """One-token de-quantization: local vocab contour -> world 10 Hz segment.

        token_idx: [A]; prev_pos: [A, 2]; prev_heading: [A].
        Returns (traj [A, SHIFT+1, 4, 2] world contours).
        Reference: agent_decoder.py:2176-2198.
        """
        vocab = jnp.asarray(self.token_traj_all)[jnp.clip(type_, 0, 2)]      # [A, V, 6, 4, 2]
        tok = jnp.take_along_axis(
            vocab, jnp.clip(token_idx, 0, None)[:, None, None, None, None], axis=1
        )[:, 0]                                                 # [A, 6, 4, 2]
        rot = rot_mat_2d(prev_heading)                          # [A, 2, 2]
        world = jnp.einsum("ascj,ajk->asck", tok, rot) + prev_pos[:, None, None, :]
        return world


def np_token_boundaries(T10: int):
    """Host helper: 10 Hz indices of token boundaries [SHIFT, 2*SHIFT, ...]."""
    return np.arange(SHIFT, T10, SHIFT)
