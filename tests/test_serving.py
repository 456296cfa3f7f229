"""Occupancy-bucketed rollout serving (infgen_tpu/rollout/serving.py).

Capacity invariance is the load-bearing property: a scenario rolled out in a
smaller (A, P) bucket must produce exactly the trajectories of the full-
capacity program, because inactive slots and padded map tokens are masked out
of every attention/aggregation. (The reference pays constant buffer_size=128
cost instead — agent_decoder.py:1920-1999.)
"""

import jax
import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.scenario import Scenario
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.rollout.serving import (RolloutServer, compact_scenario,
                                        repad_scenario)
from infgen_tpu.train.train_step import Trainer

TINY = dict(max_agents=16, max_map_tokens=128, num_agent_layers=2,
            num_seed_layers=1, num_map_layers=1, hidden_dim=32,
            num_heads=2, head_dim=16, num_freq_bands=8,
            num_seed_feature=4, num_recurrent_steps_val=20,
            # deterministic: argmax motion token, no insertions
            motion_beam_size=1, insert_limit=0)


def _setup():
    cfg = Config(**TINY)
    tr = Trainer(cfg)
    scen = make_synthetic_scenario(cfg, seed=0, num_agents=6)
    state = tr.init_state(jax.random.PRNGKey(0), scen)
    return cfg, tr, scen, state


def test_repad_roundtrip():
    cfg, tr, scen, _ = _setup()
    # the synthetic generator fills every map-token slot, so only the agent
    # axis can shrink here; shrinking P below the real token count must raise
    small = repad_scenario(scen, 8, cfg.max_map_tokens)
    assert small.agents.position.shape[0] == 8
    assert small.map.position.shape[0] == cfg.max_map_tokens
    import pytest
    with pytest.raises(AssertionError):
        repad_scenario(scen, 8, 64)
    back = repad_scenario(small, cfg.max_agents, cfg.max_map_tokens)
    n = int(np.asarray(scen.agents.slot_mask).sum())
    np.testing.assert_array_equal(
        np.asarray(back.agents.position)[:n],
        np.asarray(scen.agents.position)[:n])
    np.testing.assert_array_equal(np.asarray(back.agents.slot_mask),
                                  np.asarray(scen.agents.slot_mask))
    p = int(np.asarray(scen.map.mask).sum())
    np.testing.assert_array_equal(np.asarray(back.map.token_idx)[:p],
                                  np.asarray(scen.map.token_idx)[:p])


def test_repad_noncontiguous_rows_and_oversize_errors():
    """Shrinking must reject real rows BEYOND the cut even when the count
    fits, and bucket_for must raise clearly for scenarios no bucket holds."""
    import pytest
    cfg, tr, scen, _ = _setup()
    # move one real agent to the top slot: count still 6, but slot 15 real
    ag = scen.agents
    sm = np.asarray(ag.slot_mask).copy()
    hole = int(np.nonzero(sm)[0][-1])
    sm[hole], sm[15] = False, True
    scen_hole = scen._replace(agents=ag._replace(slot_mask=sm))
    with pytest.raises(AssertionError, match="beyond slot"):
        repad_scenario(scen_hole, 8, cfg.max_map_tokens)
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8,), agent_headroom=0)
    assert srv.bucket_for(scen_hole)[0] == cfg.max_agents  # 16 still listed
    srv_small = RolloutServer(
        cfg.replace(max_agents=8), tr.attr, tr.motion_tok, tr.map_vocab,
        agent_buckets=(8,), agent_headroom=0)
    with pytest.raises(ValueError, match="largest bucket"):
        srv_small.bucket_for(scen_hole)


def test_bucket_selection():
    cfg, tr, scen, _ = _setup()
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8, 16), map_buckets=(64, 128),
                        agent_headroom=2)
    A, P = srv.bucket_for(scen)   # 6 agents + 2 headroom -> 8
    assert A == 8
    assert P in (64, 128)
    srv_big = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                            agent_buckets=(8, 16), agent_headroom=8)
    assert srv_big.bucket_for(scen)[0] == 16


def test_bucket_selection_measured_costs():
    """With a measured bucket_cost_ms table, bucket_for picks the cheapest
    FEASIBLE bucket and breaks near-ties (<=3%) toward the larger capacity
    (VERDICT r4 item 2: capacity-order picking chose A=96 on v5e and lost
    to A=128 because the agent axis rides the 128-lane dim)."""
    cfg, tr, scen, _ = _setup()   # 6 live agents
    mk = lambda costs, headroom=2: RolloutServer(
        cfg, tr.attr, tr.motion_tok, tr.map_vocab,
        agent_buckets=(8, 12, 16), agent_headroom=headroom,
        bucket_cost_ms=costs)
    # cheapest feasible wins outright
    assert mk({8: 5.0, 12: 10.0, 16: 10.1}).bucket_for(scen)[0] == 8
    # near-tie between 12 and 16 (the v5e A=96-vs-128 shape, 8 infeasible
    # at headroom 4: 6+4 needs >= 10): take the larger capacity
    assert mk({8: 1.0, 12: 6.0, 16: 6.05},
              headroom=4).bucket_for(scen)[0] == 16
    # genuinely cheaper mid bucket wins
    assert mk({8: 1.0, 12: 6.0, 16: 10.0},
              headroom=4).bucket_for(scen)[0] == 12
    # incomplete table falls back to capacity order
    assert mk({16: 1.0}).bucket_for(scen)[0] == 8


def test_calibrate_installs_cost_table():
    cfg, tr, scen, state = _setup()
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8, 16), agent_headroom=0,
                        num_recurrent_steps=5)
    table = srv.calibrate(state.params, scen, n_rep=1)
    assert set(table) == {8, 16}
    assert all(v > 0 for v in table.values())
    assert srv.bucket_cost_ms == table
    A, _ = srv.bucket_for(scen)
    assert A in (8, 16)


def test_batched_dispatch_matches_single():
    """rollout_batch groups by bucket + pads to power-of-two batches; every
    scenario must reproduce its single-dispatch result exactly."""
    cfg, tr, _, state = _setup()
    scens = [make_synthetic_scenario(cfg, seed=s, num_agents=n)
             for s, n in [(0, 4), (1, 12), (2, 5)]]   # buckets 8, 16, 8
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8, 16), agent_headroom=2)
    rngs = list(jax.random.split(jax.random.PRNGKey(7), 3))
    outs = srv.rollout_batch(state.params, scens, rngs)
    assert outs[0]["pred_traj"].shape[0] == 8
    assert outs[1]["pred_traj"].shape[0] == 16
    for scen, rng, out in zip(scens, rngs, outs):
        single = srv.rollout(state.params, scen, rng, input_rng=rng)
        np.testing.assert_array_equal(np.asarray(out["next_token_idx"]),
                                      np.asarray(single["next_token_idx"]))
        np.testing.assert_allclose(np.asarray(out["pred_traj"]),
                                   np.asarray(single["pred_traj"]),
                                   atol=1e-5)


def test_batched_dispatch_chunked_and_ordered():
    """max_batch chunking + occupancy ordering must not change any
    scenario's result (same per-scenario rng and bucket; only the vmap
    grouping differs) and results stay in input order."""
    cfg, tr, _, state = _setup()
    scens = [make_synthetic_scenario(cfg, seed=s, num_agents=n)
             for s, n in [(0, 4), (1, 12), (2, 5), (3, 11), (4, 3)]]
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(16,), agent_headroom=2)
    rngs = list(jax.random.split(jax.random.PRNGKey(7), len(scens)))
    plain = srv.rollout_batch(state.params, scens, rngs)
    chunked = srv.rollout_batch(state.params, scens, rngs, max_batch=2,
                                order_by_occupancy=True)
    for p, c in zip(plain, chunked):
        np.testing.assert_array_equal(np.asarray(p["next_token_idx"]),
                                      np.asarray(c["next_token_idx"]))
        np.testing.assert_allclose(np.asarray(p["pred_traj"]),
                                   np.asarray(c["pred_traj"]), atol=1e-5)


def _scatter_agents(scen, slots):
    """Move the live agent rows (stable order) to the given slot indices."""
    ag = scen.agents
    A = np.asarray(ag.slot_mask).shape[0]
    live = np.nonzero(np.asarray(ag.slot_mask))[0]
    assert len(slots) == len(live)
    perm = np.full((A,), -1, np.int64)        # new row <- old row
    perm[np.asarray(slots)] = live
    holes = np.setdiff1d(np.arange(A), np.asarray(slots))
    perm[holes] = np.setdiff1d(np.arange(A), live)
    fields = {f: np.asarray(getattr(ag, f))[perm]
              for f in ("valid", "position", "elevation", "heading",
                        "velocity", "shape", "type", "slot_mask",
                        "train_mask")}
    fields["av_index"] = np.asarray(
        int(np.nonzero(perm == int(np.asarray(ag.av_index)))[0][0]))
    return scen._replace(agents=type(ag)(**fields))


def test_compaction_enables_small_bucket():
    """compact=True packs scattered live rows into a prefix so bucket_for
    can pick the small bucket, and the rollout — permutation-equivariant
    over agent slots — reproduces the contiguous scenario's outputs exactly.
    slot_perm maps bucket rows back to the caller's original slots."""
    cfg, tr, scen, state = _setup()
    # 6 live agents scattered monotonically across 16 slots: compaction
    # recovers the original contiguous layout exactly
    slots = [0, 3, 5, 9, 12, 15]
    scattered = _scatter_agents(scen, slots)

    comp, perm = compact_scenario(scattered)
    np.testing.assert_array_equal(perm[:6], slots)
    np.testing.assert_array_equal(np.asarray(comp.agents.position),
                                  np.asarray(scen.agents.position))
    assert int(np.asarray(comp.agents.av_index)) == \
        int(np.asarray(scen.agents.av_index))

    srv_plain = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                              agent_buckets=(8, 16), agent_headroom=2)
    assert srv_plain.bucket_for(scattered)[0] == 16   # row 15 is real
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8, 16), agent_headroom=2,
                        compact=True)
    rng = jax.random.PRNGKey(3)
    out = srv.rollout(state.params, scattered, rng, input_rng=rng)
    assert out["pred_traj"].shape[0] == 8             # compacted -> bucket 8
    np.testing.assert_array_equal(out["slot_perm"][:6], slots)

    ref = srv.rollout(state.params, scen, rng, input_rng=rng)
    np.testing.assert_array_equal(np.asarray(out["next_token_idx"])[:6],
                                  np.asarray(ref["next_token_idx"])[:6])
    np.testing.assert_array_equal(np.asarray(out["pred_traj"])[:6],
                                  np.asarray(ref["pred_traj"])[:6])

    # batched path carries the per-scenario perm too
    outs = srv.rollout_batch(state.params, [scattered, scen],
                             list(jax.random.split(rng, 2)))
    assert outs[0]["pred_traj"].shape[0] == 8
    np.testing.assert_array_equal(outs[0]["slot_perm"][:6], slots)


def test_capacity_invariant_rollout():
    from infgen_tpu.rollout.closed_loop import make_rollout_fn

    cfg, tr, scen, state = _setup()
    rng = jax.random.PRNGKey(3)
    inputs = jax.jit(lambda s, r: build_model_inputs(
        cfg, tr.motion_tok, tr.attr, s, r))(scen, rng)
    full = make_rollout_fn(tr.model, cfg, tr.attr, tr.motion_tok,
                           tr.map_vocab)
    out_full = full(state.params, scen, inputs, rng)

    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8, 16), map_buckets=(64, 128),
                        agent_headroom=2)
    out_small = srv.rollout(state.params, scen, rng, input_rng=rng)
    n = int(np.asarray(scen.agents.slot_mask).sum())
    assert out_small["pred_traj"].shape[0] == 8          # ran in the bucket
    np.testing.assert_array_equal(
        np.asarray(out_small["next_token_idx"])[:n],
        np.asarray(out_full["next_token_idx"])[:n])
    np.testing.assert_allclose(np.asarray(out_small["pred_traj"])[:n],
                               np.asarray(out_full["pred_traj"])[:n],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_small["slot_active"])[:n],
                                  np.asarray(out_full["slot_active"])[:n])
