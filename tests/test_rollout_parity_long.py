"""Long-horizon rollout parity: the temporal sliding-window regime.

VERDICT r3 #1: the round-3 parity runs (R=50 motion / R=20 insertion) stayed
below the window boundary — with time_span=60 the window is W=12 columns and
neither run ever evicted a column, so ~80% of every production rollout
(columns 13..62 of the flagship config) ran a code path no test compared to
the reference. These tests cross the boundary many times:

  motion — R=120: Ti = (120+10)//5 = 26 columns > W=12, i.e. 14 window
           rolls. Token/state ids must stay BITWISE equal through every
           eviction (repo `closed_loop.py` start=clip(c-W,0,Ti-W), keys
           k in [c-W, c-1]; reference builds edges with
           0 < dt <= time_span/shift, agent_decoder.py:586-587, and an
           inference mask pinning the query column, :2120-2131).
  insert — R=70 forced insertion: 14 token steps > W=12, so inserted
           agents' bos columns fall out of the window while they are still
           alive. Insertion decisions (per-column enter counts, state ids)
           must stay bitwise equal.

Near-tie token flips: closed-loop drift is multiplicative — an inserted
agent's pose is decoded from a grid cell and fed back through relative
geometry for every later step, so after ~13 steps the two frameworks'
logits differ by ~1e-3 (fp32 reduction-order noise amplified by the
feedback loop, NOT a masking bug). When two vocab entries land within that
band, argmax legitimately flips. The motion-mode run is proof the window
logic itself is exact (zero flips over 26 columns); the insertion run
tolerates flips only where the repo's own logits certify a near-tie
(gap < 5e-3) and only in a handful of cells (<= 1% of the token grid).
Everything that feeds the simulation's *semantics* — states, insertion
counts, attributes — is still asserted bitwise.
"""

import numpy as np
import pytest

from infgen_tpu.config import ENTER_STATE, INVALID_STATE
from tests.test_rollout_parity import _cfg, _run_pair, _wrapdiff


@pytest.fixture(scope="module")
def motion_pair_long():
    # Ti=26 columns: the W=12 window rolls 14 times
    cfg = _cfg(max_agents=14, steps=120, disable_insertion=True)
    return _run_pair(cfg, force_insert=False) + (cfg,)


@pytest.fixture(scope="module")
def insert_pair_long():
    # 14 token steps of forced insertion; 64 slots keep capacity non-binding
    # (16 inserts + 14 initial agents measured)
    cfg = _cfg(max_agents=64, steps=70, disable_insertion=False)
    return _run_pair(cfg, force_insert=True, debug=True) + (cfg,)


# --------------------------------------------------------------------- #
# motion mode across 14 window boundary crossings
# --------------------------------------------------------------------- #

def test_motion_long_token_ids_bitwise(motion_pair_long):
    repo, ref, n, cfg = motion_pair_long
    np.testing.assert_array_equal(repo["next_token_idx"][:n],
                                  ref["next_token_idx"])


def test_motion_long_state_ids_bitwise(motion_pair_long):
    repo, ref, n, cfg = motion_pair_long
    np.testing.assert_array_equal(repo["next_state_idx"][:n],
                                  ref["next_state_idx"])


def test_motion_long_trajectories(motion_pair_long):
    repo, ref, n, cfg = motion_pair_long
    v = ref["pred_valid"][:, :, None].astype(bool)
    err = np.abs(repo["pred_traj"][:n] - ref["pred_traj"]) * v
    assert err.max() < 1e-3, f"traj err {err.max():.2e}"
    herr = _wrapdiff(repo["pred_head"][:n], ref["pred_head"]) * v[..., 0]
    assert herr.max() < 1e-3, f"head err {herr.max():.2e}"


def test_motion_long_crosses_window(motion_pair_long):
    """Guard: this config really exercises eviction (Ti > W)."""
    repo, ref, n, cfg = motion_pair_long
    Ti = ref["next_token_idx"].shape[1]
    W = cfg.time_span // 5
    assert Ti > W + 2, f"Ti={Ti} does not cross the W={W} window"


# --------------------------------------------------------------------- #
# forced insertion past the window boundary
# --------------------------------------------------------------------- #

def test_insert_long_counts_bitwise(insert_pair_long):
    repo, ref, n, cfg = insert_pair_long
    n_ref = ref["pred_traj"].shape[0] - n
    assert int(repo["n_inserted"]) == n_ref
    ref_enters = (ref["next_state_idx"] == ENTER_STATE).sum(0)
    repo_enters = (repo["next_state_idx"] == ENTER_STATE).sum(0)
    np.testing.assert_array_equal(repo_enters, ref_enters)


def test_insert_long_state_ids_bitwise(insert_pair_long):
    repo, ref, n, cfg = insert_pair_long
    rows = ref["next_state_idx"].shape[0]
    np.testing.assert_array_equal(repo["next_state_idx"][:rows],
                                  ref["next_state_idx"])


def test_insert_long_token_ids(insert_pair_long):
    """Token ids bitwise except certified near-tie argmax flips (module
    docstring): every mismatching cell must show a repo-logit gap < 5e-3
    between the two candidates, and at most 1% of cells may flip."""
    repo, ref, n, cfg = insert_pair_long
    rows = ref["next_token_idx"].shape[0]
    rt = np.asarray(repo["next_token_idx"][:rows])
    ft = ref["next_token_idx"]
    diff = np.argwhere(rt != ft)
    assert len(diff) <= max(1, rt.size // 100), \
        f"{len(diff)} token flips of {rt.size} cells — not near-tie noise"
    H = 2  # history columns; scan step s predicts column s + H
    logits = np.asarray(repo["debug_token_logits"], np.float64)
    for r, c in diff:
        lg = logits[c - H, r]
        gap = abs(lg[rt[r, c]] - lg[ft[r, c]])
        assert gap < 5e-3, (
            f"row {r} col {c}: repo {rt[r, c]} vs ref {ft[r, c]} "
            f"logit gap {gap:.2e} — too large for a near-tie flip")
        # the flipped token must be the repo argmax and the ref token the
        # runner-up (a genuine photo-finish, not a different distribution)
        top2 = np.argsort(lg)[::-1][:2]
        assert set(top2) == {rt[r, c], ft[r, c]}


def test_insert_long_attrs(insert_pair_long):
    repo, ref, n, cfg = insert_pair_long
    rows = ref["pred_traj"].shape[0]
    np.testing.assert_array_equal(repo["pred_type"][:rows], ref["pred_type"])
    np.testing.assert_allclose(repo["pred_shape"][:rows], ref["pred_shape"],
                               atol=1e-3)


def test_insert_long_crosses_window(insert_pair_long):
    repo, ref, n, cfg = insert_pair_long
    Ti = ref["next_state_idx"].shape[1]
    W = cfg.time_span // 5
    assert Ti > W + 2, f"Ti={Ti} does not cross the W={W} window"
