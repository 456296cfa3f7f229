"""Streaming unbounded-horizon rollout (infgen_tpu/rollout/streaming.py).

Load-bearing properties:
1. Causal prefix: the first segment IS the plain rollout (the scan is
   causal, so a shorter-horizon program reproduces the long program's
   prefix) — checked against a single long rollout.
2. The global agent registry stitches segments consistently: stable gids
   across compaction/re-bucketing, legal state ids, finite motion, ego
   alive forever, frame accounting exact.
3. Determinism: same seed -> identical stitched arrays.
"""

import jax
import numpy as np

from infgen_tpu.config import (Config, ENTER_STATE, EXIT_STATE,
                               INVALID_STATE, VALID_STATE)
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.rollout.closed_loop import make_rollout_fn
from infgen_tpu.rollout.serving import RolloutServer
from infgen_tpu.rollout.streaming import StreamingRollout, continuation_scenario
from infgen_tpu.train.train_step import Trainer

TINY = dict(max_agents=16, max_map_tokens=128, num_agent_layers=2,
            num_seed_layers=1, num_map_layers=1, hidden_dim=32,
            num_heads=2, head_dim=16, num_freq_bands=8,
            num_seed_feature=4)


def _setup(**kw):
    cfg = Config(**TINY, **kw)
    tr = Trainer(cfg)
    scen = make_synthetic_scenario(cfg, seed=0, num_agents=6)
    state = tr.init_state(jax.random.PRNGKey(0), scen)
    return cfg, tr, scen, state


def test_streaming_prefix_matches_long_rollout():
    """Motion-only, beam 1 (deterministic): the stitched stream's first
    segment must reproduce the long single-program rollout's prefix."""
    cfg, tr, scen, state = _setup(num_recurrent_steps_val=40,
                                  motion_beam_size=1, insert_limit=0)
    Hs = cfg.num_historical_steps
    R_seg = 20

    rng = jax.random.PRNGKey(3)
    _, seg_rng = jax.random.split(rng)   # the stream's segment-0 key

    long_fn = make_rollout_fn(tr.model, cfg, tr.attr, tr.motion_tok,
                              tr.map_vocab, jit=True)
    inputs = jax.jit(lambda s, r: build_model_inputs(
        cfg, tr.motion_tok, tr.attr, s, r))(scen, seg_rng)
    out_long = jax.device_get(long_fn(state.params, scen, inputs, seg_rng))

    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(16,), num_recurrent_steps=R_seg)
    stream = StreamingRollout(srv, segment_steps=R_seg)
    res = stream.run(state.params, scen, rng, total_steps=40)

    n = int(np.asarray(scen.agents.slot_mask).sum())
    F_pre = Hs + R_seg
    # synthetic live rows are already contiguous, so gid i == slot i
    np.testing.assert_allclose(res["traj"][:n, :F_pre],
                               np.asarray(out_long["pred_traj"])[:n, :F_pre],
                               atol=1e-4)
    np.testing.assert_array_equal(
        res["state"][:n, :F_pre],
        np.asarray(out_long["pred_state"])[:n, :F_pre])
    assert res["traj"].shape[1] == Hs + 40
    assert res["frames_per_segment"] == [Hs + 20, 20]


def test_streaming_with_insertion_invariants_and_determinism():
    cfg, tr, scen, state = _setup(num_recurrent_steps_val=20)
    Hs = cfg.num_historical_steps
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8, 16), agent_headroom=2,
                        num_recurrent_steps=20)
    stream = StreamingRollout(srv, segment_steps=20)
    res = stream.run(state.params, scen, jax.random.PRNGKey(5),
                     total_steps=60)
    res2 = stream.run(state.params, scen, jax.random.PRNGKey(5),
                      total_steps=60)

    G, F = res["state"].shape
    n0 = int(np.asarray(scen.agents.slot_mask).sum())
    assert F == Hs + 60 and len(res["segments"]) == 3
    assert G >= n0
    assert res["traj"].shape == (G, F, 2)
    assert np.isfinite(res["traj"]).all()
    assert set(np.unique(res["state"])) <= {INVALID_STATE, VALID_STATE,
                                            ENTER_STATE, EXIT_STATE}
    # ego alive across every frame after the initial one
    assert (res["state"][res["av_gid"], 2:] != INVALID_STATE).all()
    # streaming guarantee: an agent whose state at a segment's LAST frame is
    # EXIT/INVALID loses its slot and never reappears in later segments (its
    # freed slot may be reused, but that is a new gid). Within a segment the
    # state is a per-step head argmax (reference semantics) and may flicker.
    bounds = np.cumsum(res["frames_per_segment"])
    for g in range(G):
        s = res["state"][g]
        for fb in bounds[:-1]:
            if s[fb - 1] in (INVALID_STATE, EXIT_STATE) and \
                    (s[:fb] != INVALID_STATE).any():
                assert (s[fb:] == INVALID_STATE).all(), (g, fb)
    # determinism
    np.testing.assert_array_equal(res["traj"], res2["traj"])
    np.testing.assert_array_equal(res["state"], res2["state"])
    assert res["segments"] == res2["segments"]


def test_streaming_run_batch_matches_run():
    """run_batch streams a fleet through vmapped bucket executables; each
    scenario must reproduce its single-stream result (token decisions are
    exact under batching, test_serving.py::test_batched_dispatch_matches_
    single, so the stitched streams match to float tolerance)."""
    cfg, tr, _, state = _setup(num_recurrent_steps_val=20)
    scens = [make_synthetic_scenario(cfg, seed=s, num_agents=n)
             for s, n in [(0, 6), (1, 12), (2, 5)]]
    srv = RolloutServer(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                        agent_buckets=(8, 16), agent_headroom=2,
                        num_recurrent_steps=20)
    stream = StreamingRollout(srv, segment_steps=20)
    rngs = list(jax.random.split(jax.random.PRNGKey(9), len(scens)))
    batch_res = stream.run_batch(state.params, scens, rngs, total_steps=40)
    for scen, rng, rb in zip(scens, rngs, batch_res):
        rs = stream.run(state.params, scen, rng, total_steps=40)
        assert rb["state"].shape == rs["state"].shape
        np.testing.assert_array_equal(rb["state"], rs["state"])
        np.testing.assert_allclose(rb["traj"], rs["traj"], atol=1e-4)
        assert rb["segments"] == rs["segments"]
        assert rb["av_gid"] == rs["av_gid"]
        assert rb["frames_per_segment"] == rs["frames_per_segment"]


def test_continuation_scenario_semantics():
    """Slot freeing + history extraction: exited/invalid rows lose their
    slot, live rows carry exactly the last Hs frames."""
    cfg, tr, scen, state = _setup(num_recurrent_steps_val=20,
                                  motion_beam_size=1, insert_limit=0)
    Hs = cfg.num_historical_steps
    fn = make_rollout_fn(tr.model, cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                         jit=True)
    rng = jax.random.PRNGKey(1)
    inputs = jax.jit(lambda s, r: build_model_inputs(
        cfg, tr.motion_tok, tr.attr, s, r))(scen, rng)
    out = {k: np.array(v) for k, v in
           jax.device_get(fn(state.params, scen, inputs, rng)).items()}

    # forge one live row into an exit at the last frame
    av = int(out["av_index"])
    victim = next(r for r in np.nonzero(out["slot_active"])[0] if r != av)
    out["pred_state"][victim, -1] = EXIT_STATE

    nxt = continuation_scenario(scen, out, Hs)
    assert not bool(np.asarray(nxt.agents.slot_mask)[victim])
    assert bool(np.asarray(nxt.agents.slot_mask)[av])
    assert nxt.agents.position.shape[1] == Hs
    live = np.asarray(nxt.agents.slot_mask)
    np.testing.assert_allclose(
        np.asarray(nxt.agents.position)[live],
        out["pred_traj"][live, -Hs:], atol=0)
    # velocities are 10 Hz finite differences on valid pairs
    v = np.asarray(nxt.agents.velocity)[av, 5]
    d = (out["pred_traj"][av, -Hs + 5] - out["pred_traj"][av, -Hs + 4]) * 10
    np.testing.assert_allclose(v, d, atol=1e-5)


def test_continuation_device_matches_host():
    """continuation_device is the jnp twin of continuation_scenario: every
    agent-field array must be bitwise-equal for the same rollout output."""
    from infgen_tpu.rollout.streaming import continuation_device
    cfg, tr, scen, state = _setup(num_recurrent_steps_val=20)
    Hs = cfg.num_historical_steps
    fn = make_rollout_fn(tr.model, cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                         jit=True)
    rng = jax.random.PRNGKey(2)
    inputs = jax.jit(lambda s, r: build_model_inputs(
        cfg, tr.motion_tok, tr.attr, s, r))(scen, rng)
    out = jax.device_get(fn(state.params, scen, inputs, rng))

    host = continuation_scenario(scen, out, Hs)
    dev = jax.device_get(jax.jit(
        lambda s, o: continuation_device(s, o, Hs))(scen, out))
    for field in host.agents._fields:
        a = np.asarray(getattr(host.agents, field))
        b = np.asarray(getattr(dev.agents, field))
        np.testing.assert_array_equal(a, b, err_msg=field)


def test_fused_stream_matches_host_loop():
    """make_stream_fn (one compiled program for all segments) must
    reproduce the segment-by-segment host loop with the same key schedule
    and no compaction: integer decisions exactly, floats to tolerance."""
    from infgen_tpu.rollout.streaming import make_stream_fn
    cfg, tr, scen, state = _setup(num_recurrent_steps_val=20)
    Hs = cfg.num_historical_steps
    R = 20
    n_seg = 3

    stream_fn = make_stream_fn(tr.model, cfg, tr.attr, tr.motion_tok,
                               tr.map_vocab, segment_steps=R,
                               n_segments=n_seg)
    stacked = jax.device_get(
        stream_fn(state.params, scen, jax.random.PRNGKey(11)))
    assert stacked["pred_state"].shape == (n_seg, cfg.max_agents, Hs + R)

    # host reference loop: same per-segment split(rng) schedule, device
    # continuation replaced by the numpy twin, NO compaction
    roll = make_rollout_fn(tr.model, cfg, tr.attr, tr.motion_tok,
                           tr.map_vocab, num_recurrent_steps=R, jit=True)
    build = jax.jit(lambda s, r: build_model_inputs(
        cfg, tr.motion_tok, tr.attr, s, r))
    rng = jax.random.PRNGKey(11)
    cur = scen
    for seg in range(n_seg):
        rng, k = jax.random.split(rng)
        out = jax.device_get(roll(state.params, cur, build(cur, k), k))
        np.testing.assert_array_equal(stacked["pred_state"][seg],
                                      out["pred_state"], err_msg=f"seg{seg}")
        np.testing.assert_array_equal(stacked["slot_active"][seg],
                                      out["slot_active"])
        np.testing.assert_array_equal(stacked["pred_type"][seg],
                                      out["pred_type"])
        assert int(stacked["n_inserted"][seg]) == int(out["n_inserted"])
        np.testing.assert_allclose(stacked["pred_traj"][seg],
                                   out["pred_traj"], atol=1e-4)
        cur = continuation_scenario(cur, out, Hs)


def test_fused_stream_stitch_and_vmap():
    """stitch_stream_outputs produces the StreamingRollout.run result
    schema with the same invariants; the stream fn vmaps over a fleet."""
    from infgen_tpu.rollout.streaming import (make_stream_fn,
                                              stitch_stream_outputs)
    cfg, tr, scen, state = _setup(num_recurrent_steps_val=20)
    Hs = cfg.num_historical_steps
    stream_fn = make_stream_fn(tr.model, cfg, tr.attr, tr.motion_tok,
                               tr.map_vocab, segment_steps=20, n_segments=3)
    res = stitch_stream_outputs(
        stream_fn(state.params, scen, jax.random.PRNGKey(4)), Hs)

    G, F = res["state"].shape
    assert F == Hs + 60 and len(res["segments"]) == 3
    assert res["frames_per_segment"] == [Hs + 20, 20, 20]
    assert res["traj"].shape == (G, F, 2)
    assert np.isfinite(res["traj"]).all()
    assert (res["state"][res["av_gid"], 2:] != INVALID_STATE).all()
    # an agent dead at a segment boundary never reappears (slot reuse
    # becomes a new gid)
    bounds = np.cumsum(res["frames_per_segment"])
    for g in range(G):
        s = res["state"][g]
        for fb in bounds[:-1]:
            if s[fb - 1] in (INVALID_STATE, EXIT_STATE) and \
                    (s[:fb] != INVALID_STATE).any():
                assert (s[fb:] == INVALID_STATE).all(), (g, fb)

    # fleet streaming: vmap over (scenario, rng); lane 0 must reproduce the
    # single-scenario stream bitwise on integer outputs
    from infgen_tpu.train.train_step import stack_scenarios
    scens = [scen, make_synthetic_scenario(cfg, seed=3, num_agents=9)]
    batch = stack_scenarios(scens)
    rngs = jnp_stack_keys = jax.random.split(jax.random.PRNGKey(4), 2)
    vfn = jax.jit(jax.vmap(make_stream_fn(
        tr.model, cfg, tr.attr, tr.motion_tok, tr.map_vocab,
        segment_steps=20, n_segments=3, jit=False),
        in_axes=(None, 0, 0)))
    outs = jax.device_get(vfn(state.params, batch, rngs))
    lane0 = jax.tree.map(lambda x: x[0], outs)
    single = jax.device_get(
        stream_fn(state.params, scen, rngs[0]))
    np.testing.assert_array_equal(lane0["pred_state"],
                                  single["pred_state"])
    res_lane = stitch_stream_outputs(lane0, Hs)
    assert res_lane["state"].shape[1] == Hs + 60


def test_chunked_stream_runner_and_fallback():
    """make_chunked_stream_runner (the shared bench/bench_sweep driver):
    chunk outputs are finite and correctly shaped per bucket, the planned
    re-bucket is taken when survivors fit, and a bucket too small for the
    survivors falls back to full capacity by LAZILY compiling the
    full-capacity executable (a pre-built fn table KeyError'd here)."""
    from infgen_tpu.rollout.streaming import make_chunked_stream_runner
    cfg, tr, scen, state = _setup(num_recurrent_steps_val=20)
    scens = [scen, make_synthetic_scenario(cfg, seed=3, num_agents=9)]
    runner = make_chunked_stream_runner(cfg, tr.attr, tr.motion_tok,
                                        tr.map_vocab, segment_steps=20)

    # planned re-bucket: capacity 12 >= live count after chunk 1's exits
    outs, used = runner(state.params, scens, ((16, 1), (12, 1)),
                        jax.random.PRNGKey(5))
    assert used[0] == 16 and used[1] in (12, 16)
    # chunk outputs are [B, n_segments, A_bucket, T, 2]
    assert [o["pred_traj"].shape[2] for o in outs] == [16, used[1]]
    for o in outs:
        assert np.isfinite(np.asarray(o["pred_traj"])).all()

    # fallback: a 1-slot bucket can never hold the survivors (the ego alone
    # occupies one slot; chunk 1 keeps >=1 agent alive), so chunk 2 must
    # run at full capacity instead of KeyError-ing
    outs_f, used_f = runner(state.params, scens, ((16, 1), (1, 1)),
                            jax.random.PRNGKey(5))
    assert used_f == [16, 16]
    # identical keys + identical capacity => chunk 1 is reproducible
    np.testing.assert_array_equal(np.asarray(outs_f[0]["pred_state"]),
                                  np.asarray(outs[0]["pred_state"]))
