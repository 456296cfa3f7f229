"""Streaming ("infinite") closed-loop generation at bounded memory.

The reference generates long horizons by letting its python inference loop
run more recurrent steps (`num_recurrent_steps`, agent_decoder.py:1605-2389)
— per-step python state and output tensors grow with the horizon. Under XLA
the compiled rollout has a static horizon R and static capacity (A, P); this
module streams an arbitrarily long simulation through that fixed program:

  run one R-step segment -> take its last `num_historical_steps` frames as
  the next segment's history (re-tokenized exactly like logged history) ->
  free the slots of agents that exited -> compact live rows into a prefix
  (`compact_scenario`) and re-bucket (`RolloutServer`) -> continue.

Compile cost, HBM, and host memory per segment stay O(R x bucket); the
horizon and the total number of simulated agents are unbounded (dead slots
are recycled between segments, which the in-segment program cannot do).
Every segment reuses the same cached bucket executables.

The temporal window makes the restart near-exact: the trunk only attends to
the last `time_span // SHIFT` token columns anyway (closed_loop.py window
slice; reference edge filter agent_decoder.py:586-587), so a segment
boundary differs from a continuous rollout only through motion
re-tokenization of the seam history (the contour matcher re-quantizes the
rolled-out 10 Hz poses — sub-token drift, same class as the reference's own
history stitching at :2311-2335).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.config import (ENTER_STATE, EXIT_STATE, INVALID_STATE,
                               VALID_STATE)
from infgen_tpu.data.scenario import AgentData, Scenario
from infgen_tpu.rollout.serving import RolloutServer, compact_scenario


def continuation_scenario(prev: Scenario, out: Dict, num_historical_steps: int
                          ) -> Scenario:
    """Build the next segment's Scenario from a rollout output.

    The last `num_historical_steps` 10 Hz frames of the rollout become the
    new history; slots whose final state is INVALID or EXIT are freed
    (slot_mask False) so compaction can recycle them. Row order is preserved
    (row i of the result is row i of the rollout output).
    """
    Hs = num_historical_steps
    traj = np.asarray(out["pred_traj"])[:, -Hs:]            # [A, Hs, 2]
    head = np.asarray(out["pred_head"])[:, -Hs:]
    state = np.asarray(out["pred_state"])[:, -Hs:]
    active = np.asarray(out["slot_active"])
    A = traj.shape[0]

    # a frame is a real pose for every non-INVALID state (ENTER included:
    # the insertion records the agent's pose from its enter column; EXIT
    # frames still carry the final pose)
    valid = (state != INVALID_STATE) & active[:, None]
    alive = active & (state[:, -1] != INVALID_STATE) \
        & (state[:, -1] != EXIT_STATE)
    av = int(np.asarray(out["av_index"]))
    alive[av] = True                                        # ego never exits

    # 10 Hz finite-difference velocity, zeroed where either endpoint of the
    # difference is invalid (frame 0 copies frame 1's estimate)
    vel = np.zeros_like(traj)
    vel[:, 1:] = (traj[:, 1:] - traj[:, :-1]) * 10.0
    vel[:, 0] = vel[:, 1]
    pair_ok = valid.copy()
    pair_ok[:, 1:] &= valid[:, :-1]
    pair_ok[:, 0] = pair_ok[:, 1]
    vel = np.where(pair_ok[:, :, None], vel, 0.0)

    # elevation: planar model (reference hardcodes simulated z = 0,
    # agent_decoder.py:2338); carry the previous scenario's last logged z
    # forward for rows that had one, 0 for inserted agents
    prev_elev = np.asarray(prev.agents.elevation)
    last_z = np.zeros((A,), np.float32)
    n = min(A, prev_elev.shape[0])
    pv = np.asarray(prev.agents.valid)[:n]
    has = pv.any(axis=1)
    idx = np.where(has, pv.shape[1] - 1 - np.argmax(pv[:, ::-1], axis=1), 0)
    last_z[:n] = np.where(has, prev_elev[np.arange(n), idx], 0.0)
    elev = np.broadcast_to(last_z[:, None], (A, Hs)).copy()

    agents = AgentData(
        valid=valid & alive[:, None],
        position=np.where(valid[:, :, None], traj, 0.0).astype(np.float32),
        elevation=elev.astype(np.float32),
        heading=np.where(valid, head, 0.0).astype(np.float32),
        velocity=vel.astype(np.float32),
        shape=np.asarray(out["pred_shape"], np.float32),
        type=np.asarray(out["pred_type"], np.int32),
        slot_mask=alive,
        train_mask=alive,
        av_index=np.asarray(av, np.int32),
    )
    return Scenario(agents=agents, map=prev.map,
                    scenario_id=prev.scenario_id)


class _ScenarioStream:
    """Host-side per-scenario registry across segments: every agent that
    ever lived gets a stable global id (gid); per-segment bucket rows are
    mapped back through the compaction permutations."""

    def __init__(self, scenario: Scenario, Hs: int):
        self.scen = scenario
        self.Hs = Hs
        self.traj_all: list = []
        self.head_all: list = []
        self.state_all: list = []                           # [G, F] growing
        self.gid_type: list = []
        self.gid_shape: list = []
        self.slot2gid: Optional[np.ndarray] = None          # row -> gid
        self.av_gid = None
        self.per_segment: list = []
        self._scen_c: Optional[Scenario] = None

    def begin_segment(self) -> Scenario:
        # compact live rows into a prefix so bucket_for can shrink; the
        # server then re-pads to its bucket without reordering rows
        scen_c, perm = compact_scenario(self.scen)
        if self.slot2gid is None:
            # first segment: every compacted live row is a new gid
            n_live = int(np.asarray(scen_c.agents.slot_mask).sum())
            self.slot2gid = np.full((perm.shape[0],), -1, np.int64)
            self.slot2gid[:n_live] = np.arange(n_live)
            self.gid_type = list(np.asarray(scen_c.agents.type)[:n_live])
            self.gid_shape = list(np.asarray(scen_c.agents.shape)[:n_live])
        else:
            self.slot2gid = self.slot2gid[perm]
        self.av_gid = int(
            self.slot2gid[int(np.asarray(scen_c.agents.av_index))])
        assert self.av_gid >= 0
        self._scen_c = scen_c
        return scen_c

    def absorb(self, out: Dict, seg: int) -> None:
        Hs = self.Hs
        out = {k: np.asarray(v) for k, v in out.items()}
        A_b = out["pred_traj"].shape[0]
        # bucket rows beyond the previous capacity start unmapped
        row2gid = np.full((A_b,), -1, np.int64)
        n_map = min(A_b, self.slot2gid.shape[0])
        row2gid[:n_map] = self.slot2gid[:n_map]

        # newly-activated slots this segment -> fresh gids
        active = out["slot_active"]
        for r in np.nonzero(active & (row2gid < 0))[0]:
            row2gid[r] = len(self.gid_type)
            self.gid_type.append(int(out["pred_type"][r]))
            self.gid_shape.append(np.asarray(out["pred_shape"][r]))

        # frames to append: the whole Hs+R span for segment 0, only the
        # R generated frames afterwards (the first Hs re-derive the
        # previous segment's tail)
        lo = 0 if seg == 0 else Hs
        F_new = out["pred_traj"].shape[1] - lo
        G = len(self.gid_type)
        rows = np.nonzero(row2gid >= 0)[0]
        t = np.zeros((G, F_new, 2), np.float32)
        h = np.zeros((G, F_new), np.float32)
        s = np.full((G, F_new), INVALID_STATE, out["pred_state"].dtype)
        t[row2gid[rows]] = out["pred_traj"][rows, lo:]
        h[row2gid[rows]] = out["pred_head"][rows, lo:]
        s[row2gid[rows]] = out["pred_state"][rows, lo:]
        self.traj_all.append(t)
        self.head_all.append(h)
        self.state_all.append(s)
        self.per_segment.append(dict(
            bucket=A_b, n_alive=int(active.sum()),
            n_inserted=int(out["n_inserted"])))

        self.scen = continuation_scenario(self._scen_c, out, Hs)
        # rows that did not survive the boundary lose their gid: their
        # slot may be recycled by a later insertion, which must become a
        # NEW agent, not a resurrection of the dead gid
        self.slot2gid = np.where(np.asarray(self.scen.agents.slot_mask),
                                 row2gid, -1)

    def result(self, n_seg: int, R: int) -> Dict:
        G = len(self.gid_type)

        def cat(bufs, fill):
            """Stitch per-segment [G_seg, F] blocks over a common G rows
            (later segments know more agents; earlier blocks pad with
            fill = the agent did not exist yet)."""
            out_ = []
            for b in bufs:
                if b.shape[0] < G:
                    pad = np.full((G - b.shape[0],) + b.shape[1:], fill,
                                  b.dtype)
                    b = np.concatenate([b, pad], axis=0)
                out_.append(b)
            return np.concatenate(out_, axis=1)

        return dict(
            traj=cat(self.traj_all, 0.0),
            head=cat(self.head_all, 0.0),
            state=cat(self.state_all, INVALID_STATE),
            type=np.asarray(self.gid_type, np.int32),
            shape=np.asarray(self.gid_shape, np.float32),
            av_gid=self.av_gid,
            segments=self.per_segment,
            frames_per_segment=[self.Hs + R] + [R] * (n_seg - 1),
        )


class StreamingRollout:
    """Drive an unbounded-horizon simulation through a RolloutServer.

    `run` streams one scenario through the server's single-scenario
    executables; `run_batch` streams MANY scenarios concurrently — each
    segment is dispatched through `RolloutServer.rollout_batch`, so
    scenarios sharing a capacity bucket run vmapped on one executable and
    scenarios re-bucket independently as their live-agent count drifts.
    That is the TPU-native throughput story for long horizons: after the
    first segments a trained model's scenes compact below A=128 and the
    fleet migrates to cheaper buckets (the reference's loop instead grows
    python state without bound, agent_decoder.py:1920-1999).

    Results are numpy arrays over [G, F] (G = agents ever alive,
    F = 10 Hz frames).
    """

    def __init__(self, server: RolloutServer, segment_steps: int):
        if server.num_recurrent_steps not in (None, segment_steps):
            raise ValueError("server.num_recurrent_steps must match "
                             "segment_steps")
        self.server = server
        if server.num_recurrent_steps is None:
            server.num_recurrent_steps = segment_steps
        self.R = segment_steps
        self.Hs = server.cfg.num_historical_steps

    def run(self, params, scenario: Scenario, rng, total_steps: int) -> Dict:
        """Simulate >= total_steps future 10 Hz frames (rounded up to whole
        segments). Returns the stitched global registry."""
        n_seg = -(-total_steps // self.R)
        stream = _ScenarioStream(scenario, self.Hs)
        for seg in range(n_seg):
            rng, seg_rng = jax.random.split(rng)
            scen_c = stream.begin_segment()
            out = self.server.rollout(params, scen_c, seg_rng,
                                      input_rng=seg_rng)
            stream.absorb(out, seg)
        return stream.result(n_seg, self.R)

    def run_batch(self, params, scenarios, rngs, total_steps: int) -> list:
        """Stream a fleet of scenarios concurrently; one result dict per
        scenario (same schema as `run`). `rngs` is one key per scenario."""
        n_seg = -(-total_steps // self.R)
        streams = [_ScenarioStream(s, self.Hs) for s in scenarios]
        rngs = list(rngs)
        for seg in range(n_seg):
            seg_rngs = []
            for i in range(len(rngs)):
                rngs[i], k = jax.random.split(rngs[i])
                seg_rngs.append(k)
            scens_c = [st.begin_segment() for st in streams]
            outs = self.server.rollout_batch(params, scens_c, seg_rngs,
                                             input_rngs=seg_rngs)
            for st, out in zip(streams, outs):
                st.absorb(out, seg)
        return [st.result(n_seg, self.R) for st in streams]


# --------------------------------------------------------------------- #
# Fused on-device streaming: the whole multi-segment stream is ONE
# compiled program (outer lax.scan over segments). The host-loop path
# above round-trips every segment through the host — rollout outputs
# down, continuation scenario + re-tokenized inputs back up — which on a
# remote-TPU relay costs seconds per boundary. Here the continuation
# (jnp twin of `continuation_scenario`) and the input chain
# (`build_model_inputs`: motion re-tokenization, enterings, map masks)
# run on device inside the same jit, so a B-scenario fleet streams an
# arbitrary number of segments in a single dispatch per chunk. Slots are
# NOT compacted inside a chunk (row identity is stable; freed slots are
# re-activated in place by later insertions), so re-bucketing to a
# smaller capacity happens at chunk boundaries via the host path.
# Reference context: the reference's python loop grows state without
# bound and cannot be compiled at all (agent_decoder.py:1605-2389).
# --------------------------------------------------------------------- #


def continuation_device(prev: Scenario, out: Dict,
                        num_historical_steps: int) -> Scenario:
    """jnp twin of `continuation_scenario` (bitwise-equal arrays; tested in
    tests/test_streaming.py). Requires out's capacity == prev's capacity."""
    Hs = num_historical_steps
    traj = out["pred_traj"][:, -Hs:]
    head = out["pred_head"][:, -Hs:]
    state = out["pred_state"][:, -Hs:]
    active = out["slot_active"]
    A = traj.shape[0]

    valid = (state != INVALID_STATE) & active[:, None]
    alive = active & (state[:, -1] != INVALID_STATE) \
        & (state[:, -1] != EXIT_STATE)
    av = out["av_index"]
    alive = alive.at[av].set(True)                      # ego never exits

    diff = (traj[:, 1:] - traj[:, :-1]) * 10.0
    vel = jnp.concatenate([diff[:, :1], diff], axis=1)
    po = valid[:, 1:] & valid[:, :-1]
    pair_ok = jnp.concatenate([po[:, :1], po], axis=1)
    vel = jnp.where(pair_ok[:, :, None], vel, 0.0)

    prev_elev = prev.agents.elevation
    pv = prev.agents.valid
    has = pv.any(axis=1)
    idx = jnp.where(has, pv.shape[1] - 1 - jnp.argmax(pv[:, ::-1], axis=1), 0)
    last_z = jnp.where(
        has, jnp.take_along_axis(prev_elev, idx[:, None], axis=1)[:, 0], 0.0)
    elev = jnp.broadcast_to(last_z[:, None], (A, Hs))

    agents = AgentData(
        valid=valid & alive[:, None],
        position=jnp.where(valid[:, :, None], traj, 0.0).astype(jnp.float32),
        elevation=elev.astype(jnp.float32),
        heading=jnp.where(valid, head, 0.0).astype(jnp.float32),
        velocity=vel.astype(jnp.float32),
        shape=out["pred_shape"].astype(jnp.float32),
        type=out["pred_type"].astype(jnp.int32),
        slot_mask=alive,
        train_mask=alive,
        av_index=jnp.asarray(av, jnp.int32),
    )
    return Scenario(agents=agents, map=prev.map,
                    scenario_id=prev.scenario_id)


_STREAM_KEYS = ("pred_traj", "pred_head", "pred_state", "slot_active",
                "pred_type", "pred_shape", "n_inserted")


def make_stream_fn(model, cfg, attr, motion_tok, map_vocab,
                   segment_steps: int, n_segments: int, jit: bool = True,
                   return_final: bool = False):
    """Build `stream(params, scenario, rng) -> dict` running `n_segments`
    closed-loop segments of `segment_steps` 10 Hz frames as ONE program.

    Per-segment key schedule matches the host loop (`StreamingRollout.run`
    without compaction): `rng, k = split(rng)`; `k` drives both the input
    build and the rollout. Returns stacked outputs — pred_traj
    [S, A, Hs+R, 2], pred_head/pred_state [S, A, Hs+R], slot_active /
    pred_type [S, A], pred_shape [S, A, 3], n_inserted [S], av_index [] —
    feed to `stitch_stream_outputs` for the global agent registry.
    vmap-compatible over (scenario, rng) for fleet streaming.

    return_final=True adds "final_agents" (the AgentData of the continuation
    scenario after the LAST segment, [A, Hs] history) so a host driver can
    compact + re-bucket and hand the fleet to another fused chunk at a
    smaller capacity — the only data that crosses the host boundary between
    chunks."""
    from infgen_tpu.data.features import build_model_inputs
    from infgen_tpu.rollout.closed_loop import make_rollout_fn
    Hs = cfg.num_historical_steps
    roll = make_rollout_fn(model, cfg, attr, motion_tok, map_vocab,
                           num_recurrent_steps=segment_steps, jit=False)

    def _seg(params, scen, rng):
        rng, k = jax.random.split(rng)
        inputs = build_model_inputs(cfg, motion_tok, attr, scen, k)
        out = roll(params, scen, inputs, k)
        nxt = continuation_device(scen, out, Hs)
        return nxt, {key: out[key] for key in _STREAM_KEYS}, \
            out["av_index"], rng

    def stream(params, scenario, rng):
        # segment 0 is unrolled OUTSIDE the scan: it consumes the original
        # scenario (full logged [A, T10] history), while segments 1+ carry
        # the fixed [A, Hs] continuation shape through the scan
        scen1, out0, av, rng = _seg(params, scenario, rng)
        scen_f = scen1
        if n_segments > 1:
            def body(carry, _):
                scen, r = carry
                nxt, o, _, r = _seg(params, scen, r)
                return (nxt, r), o
            (scen_f, _), outs = jax.lax.scan(body, (scen1, rng), None,
                                             length=n_segments - 1)
            stacked = jax.tree.map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                out0, outs)
        else:
            stacked = jax.tree.map(lambda a: a[None], out0)
        stacked["av_index"] = av
        if return_final:
            stacked["final_agents"] = scen_f.agents
        return stacked

    return jax.jit(stream) if jit else stream


def make_chunked_stream_runner(cfg, attr, motion_tok, map_vocab,
                               segment_steps: int):
    """Host driver for a fleet stream split into fused chunks: run each
    `(A_bucket, n_segments)` chunk of the plan via `make_stream_fn`, and
    between chunks compact exited slots + re-bucket the fleet (the only
    host round-trip: the [A, Hs] continuation history, ~100 KB/fleet).

    Returns `run(params, scenarios, plan, key) -> (chunk_outs, buckets)`.
    Chunk executables are compiled lazily per distinct (A, n_segments) and
    cached across `run` calls — including the full-capacity fallback taken
    when a chunk's survivors exceed its planned bucket (a pre-built table
    KeyError'd on exactly that path; shared by bench.py and
    scripts/bench_sweep.py so the two "fused stream" numbers measure one
    protocol). The caller drains (e.g. `pred_traj.sum()` of the last chunk)
    before reading a wall clock."""
    from infgen_tpu.model.infgen import InfGenModel
    from infgen_tpu.rollout.serving import repad_scenario

    fns = {}

    def stream_fn(A_c, n_seg):
        if (A_c, n_seg) not in fns:
            cfg_c = cfg.replace(max_agents=A_c)
            model_c = InfGenModel(cfg_c, attr.grid, attr.grid_size,
                                  attr.angle_size)
            fns[(A_c, n_seg)] = jax.jit(jax.vmap(make_stream_fn(
                model_c, cfg_c, attr, motion_tok, map_vocab,
                segment_steps=segment_steps, n_segments=n_seg, jit=False,
                return_final=True), in_axes=(None, 0, 0)))
        return fns[(A_c, n_seg)]

    def run(params, scenarios, plan, key):
        from infgen_tpu.train.train_step import stack_scenarios
        cur, outs, used = list(scenarios), [], []
        for ci, (A_c, n_seg) in enumerate(plan):
            comp = [compact_scenario(s)[0] for s in cur]
            n_live = max(int(np.asarray(s.agents.slot_mask).sum())
                         for s in comp)
            if n_live > A_c:            # too many survivors for the planned
                A_c = cfg.max_agents    # bucket: fall back to full capacity
            cur = [repad_scenario(s, A_c, cfg.max_map_tokens) for s in comp]
            bt = stack_scenarios(cur)
            key, k = jax.random.split(key)
            out = dict(stream_fn(A_c, n_seg)(
                params, bt, jax.random.split(k, len(cur))))
            fin = out.pop("final_agents")
            if ci + 1 < len(plan):
                fin = jax.device_get(fin)
                cur = [Scenario(
                    agents=jax.tree.map(lambda x, i=i: x[i], fin),
                    map=cur[i].map, scenario_id=cur[i].scenario_id)
                    for i in range(len(cur))]
            used.append(A_c)
            outs.append(out)
        return outs, used

    return run


def stitch_stream_outputs(stacked: Dict, num_historical_steps: int) -> Dict:
    """Host-side global agent registry for `make_stream_fn` outputs (same
    result schema as `StreamingRollout.run`). Rows are slot-stable across
    segments (no compaction inside a fused chunk); a freed slot re-activated
    by a later insertion becomes a NEW agent, mirroring the host path's
    gid-loss rule at segment boundaries."""
    Hs = num_historical_steps
    stacked = {k: np.asarray(v) for k, v in stacked.items()
               if k != "final_agents"}
    state = stacked["pred_state"]
    S, A, F = state.shape
    R = F - Hs
    av = int(stacked["av_index"])

    row2gid = np.full((A,), -1, np.int64)
    gid_type: list = []
    gid_shape: list = []
    traj_all, head_all, state_all, per_segment = [], [], [], []
    av_gid = None
    for seg in range(S):
        active = stacked["slot_active"][seg]
        for r in np.nonzero(active & (row2gid < 0))[0]:
            row2gid[r] = len(gid_type)
            gid_type.append(int(stacked["pred_type"][seg][r]))
            gid_shape.append(np.asarray(stacked["pred_shape"][seg][r]))
        if av_gid is None:
            av_gid = int(row2gid[av])
            assert av_gid >= 0
        lo = 0 if seg == 0 else Hs
        G = len(gid_type)
        rows = np.nonzero(row2gid >= 0)[0]
        t = np.zeros((G, F - lo, 2), np.float32)
        h = np.zeros((G, F - lo), np.float32)
        s = np.full((G, F - lo), INVALID_STATE, state.dtype)
        t[row2gid[rows]] = stacked["pred_traj"][seg][rows, lo:]
        h[row2gid[rows]] = stacked["pred_head"][seg][rows, lo:]
        s[row2gid[rows]] = state[seg][rows, lo:]
        traj_all.append(t)
        head_all.append(h)
        state_all.append(s)
        per_segment.append(dict(bucket=A, n_alive=int(active.sum()),
                                n_inserted=int(stacked["n_inserted"][seg])))
        # survival across the boundary: mirror continuation_device's alive
        alive = active & (state[seg][:, -1] != INVALID_STATE) \
            & (state[seg][:, -1] != EXIT_STATE)
        alive[av] = True
        row2gid = np.where(alive, row2gid, -1)

    G = len(gid_type)

    def cat(bufs, fill):
        out_ = []
        for b in bufs:
            if b.shape[0] < G:
                pad = np.full((G - b.shape[0],) + b.shape[1:], fill, b.dtype)
                b = np.concatenate([b, pad], axis=0)
            out_.append(b)
        return np.concatenate(out_, axis=1)

    return dict(
        traj=cat(traj_all, 0.0),
        head=cat(head_all, 0.0),
        state=cat(state_all, INVALID_STATE),
        type=np.asarray(gid_type, np.int32),
        shape=np.asarray(gid_shape, np.float32),
        av_gid=av_gid,
        segments=per_segment,
        frames_per_segment=[Hs + R] + [R] * (S - 1),
    )
