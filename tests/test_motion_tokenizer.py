"""Parity tests: MotionTokenizer vs the reference TokenProcessor internals."""

import numpy as np
import pytest
import torch

from infgen_tpu.config import SHIFT
from infgen_tpu.tokenizers.motion_tokenizer import (
    MotionTokenizer,
    clean_heading,
    derive_state_tokens,
    extrapolate_to_prev_token_step,
)
from tests.ref_oracle import import_reference

_, ref_preprocess = import_reference()

A, T10 = 12, 91


def _random_agents(seed=0):
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(0, 0.6, size=(A, T10, 2)), axis=1).astype(np.float32)
    pos += rng.uniform(-50, 50, size=(A, 1, 2)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, size=(A, 1)).astype(np.float32)
    heading = (heading + np.cumsum(rng.normal(0, 0.05, size=(A, T10)), axis=1)).astype(np.float32)
    vel = np.gradient(pos, axis=1).astype(np.float32) * 10.0
    valid = np.ones((A, T10), dtype=bool)
    # some agents enter late / exit early
    valid[1, :23] = False
    valid[2, 60:] = False
    valid[3, :7] = False
    valid[3, 80:] = False
    valid[4, :] = False
    # an agent with a gap (invalid in the middle)
    valid[5, 40:47] = False
    type_ = rng.integers(0, 3, size=(A,)).astype(np.int32)
    return valid, pos, heading, vel, type_


@pytest.fixture(scope="module")
def ref_tp():
    return ref_preprocess.TokenProcessor(
        token_size=2048, predict_motion=True, predict_state=True, predict_map=True,
        state_token={"invalid": 0, "valid": 1, "enter": 2, "exit": 3},
    )


def test_clean_heading_matches(ref_tp):
    valid, _, heading, _, _ = _random_agents(3)
    heading = heading.copy()
    heading[0, 50] += 2.5  # inject a jump
    ref = ref_tp.clean_heading(torch.tensor(valid), torch.tensor(heading.copy())).numpy()
    ours = np.asarray(clean_heading(valid, heading))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_extrapolation_matches(ref_tp):
    valid, pos, heading, vel, _ = _random_agents(4)
    rv, rp, rh, rvel = ref_tp._extrapolate_agent_to_prev_token_step(
        torch.tensor(valid.copy()), torch.tensor(pos.copy()),
        torch.tensor(heading.copy()), torch.tensor(vel.copy()),
    )
    ov, op, oh, ovel = extrapolate_to_prev_token_step(valid, pos, heading, vel)
    np.testing.assert_array_equal(np.asarray(ov), rv.numpy())
    np.testing.assert_allclose(np.asarray(op), rp.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(oh), rh.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ovel), rvel.numpy(), atol=1e-5)


def test_full_tokenization_matches(ref_tp):
    valid, pos, heading, vel, type_ = _random_agents(5)

    # ---- reference path (mirrors _tokenize_agent, preprocess.py:364-453) ----
    tv, tp_, th, tvel = torch.tensor(valid.copy()), torch.tensor(pos.copy()), \
        torch.tensor(heading.copy()), torch.tensor(vel.copy())
    type_masks = {"veh": torch.tensor(type_ == 0), "ped": torch.tensor(type_ == 1),
                  "cyc": torch.tensor(type_ == 2)}
    th = ref_tp.clean_heading(tv, th)
    shape = ref_tp._get_agent_shape(type_masks)
    token_traj_all = ref_tp._get_token_traj_all(type_masks)
    tv, tp_, th, tvel = ref_tp._extrapolate_agent_to_prev_token_step(tv, tp_, th, tvel)
    token_traj = token_traj_all[:, :, -1]
    ref_idx, ref_contour, _ = ref_tp._match_agent_token(tv, tp_, th, shape, token_traj)

    valid_shift = tv.unfold(1, SHIFT + 1, SHIFT)
    ref_token_valid = (valid_shift[:, :, 0] & valid_shift[:, :, -1])

    # ---- ours ----
    mt = MotionTokenizer()
    out = mt.tokenize(valid, pos, heading, vel, type_)

    np.testing.assert_array_equal(np.asarray(out.raw_token_valid), ref_token_valid.numpy())

    # token indices must match exactly on steps that are valid pre-state-fixup
    ours_idx = np.asarray(out.token_idx)
    mask = ref_token_valid.numpy()
    # exclude enter/invalid slots, where ours writes -1/-2 sentinels
    cmp = mask & (ours_idx >= 0)
    np.testing.assert_array_equal(ours_idx[cmp], ref_idx.numpy()[cmp])
    np.testing.assert_allclose(
        np.asarray(out.token_contour)[cmp], ref_contour.numpy()[cmp], atol=1e-3
    )

    # state tokens: recompute reference state logic (preprocess.py:433-442)
    tvm = ref_token_valid.long()
    bos = torch.argmax(tvm, dim=1)
    eos = tvm.shape[1] - 1 - torch.argmax(torch.flip(tvm, dims=[1]), dim=1)
    state = torch.ones_like(ref_idx)
    step = torch.arange(state.shape[1])[None].repeat(state.shape[0], 1)
    state[step == bos[:, None]] = 2
    state[step == eos[:, None]] = 3
    state[(step < bos[:, None]) | (step > eos[:, None])] = 0
    state[state[:, -1] == 3, -1] = 1
    state[~ref_token_valid.any(dim=1)] = 0  # fully-invalid agents
    np.testing.assert_array_equal(np.asarray(out.state_idx), state.numpy())


def test_state_tokens_basic():
    tv = np.zeros((3, 8), dtype=bool)
    tv[0, :] = True
    tv[1, 2:6] = True
    # agent 2 never valid
    s = np.asarray(derive_state_tokens(tv))
    assert s[0, 0] == 2 and (s[0, 1:] == 1).all()  # enters at 0, exit-at-last converts to valid
    assert s[1, 2] == 2 and s[1, 5] == 3 and (s[1, :2] == 0).all() and (s[1, 6:] == 0).all()
    assert (s[2] == 0).all()
