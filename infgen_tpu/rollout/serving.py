"""Occupancy-bucketed rollout serving.

XLA programs have static shapes, so a single compiled rollout always pays the
full `max_agents` x `max_map_tokens` cost: a 20-agent scene on the default
A=128 program wastes >80% of the attention/matmul work on inactive slots
(the reference has the same constant `buffer_size=128` cost, built one agent
at a time — agent_decoder.py:1920-1999). The server keeps one compiled
executable per (A, P) capacity bucket and dispatches each scenario to the
smallest bucket that fits its live agent count (plus insertion headroom) and
map-token count. Model parameters are shape-independent (attention is data-
shaped in A and P), so one checkpoint serves every bucket.

Semantics per bucket are the standard rollout semantics at that capacity:
a smaller bucket means insertion can saturate sooner (as it would in the
reference with a smaller buffer_size). Pick `agent_headroom` accordingly.
"""

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.scenario import AgentData, MapData, Scenario, pad_axis


def repad_scenario(scenario: Scenario, max_agents: int,
                   max_map_tokens: int) -> Scenario:
    """Re-pad a fixed-shape Scenario to a different (A, P) capacity.

    Shrinking requires that all real agents / map tokens still fit — real
    rows are never truncated (asserts host-side).
    """
    ag, mp = scenario.agents, scenario.map
    # check the masks BEYOND the cut, not just counts: real rows may sit in
    # non-contiguous slots (e.g. after a rollout activated high slots)
    slot_mask = np.asarray(ag.slot_mask)
    pt_mask = np.asarray(mp.mask)
    assert not slot_mask[max_agents:].any(), (
        f"real agent rows beyond slot {max_agents}")
    assert not pt_mask[max_map_tokens:].any(), (
        f"real map tokens beyond index {max_map_tokens}")
    assert int(np.asarray(ag.av_index)) < max_agents

    def rag(x):
        return pad_axis(np.asarray(x), max_agents)

    agents = AgentData(
        valid=rag(ag.valid), position=rag(ag.position),
        elevation=rag(ag.elevation), heading=rag(ag.heading),
        velocity=rag(ag.velocity), shape=rag(ag.shape), type=rag(ag.type),
        slot_mask=rag(ag.slot_mask), train_mask=rag(ag.train_mask),
        av_index=np.asarray(ag.av_index))

    def rpt(x, fill=0):
        return pad_axis(np.asarray(x), max_map_tokens, fill=fill)

    maps = MapData(
        position=rpt(mp.position), orientation=rpt(mp.orientation),
        token_idx=rpt(mp.token_idx), pt_type=rpt(mp.pt_type),
        pt_side=rpt(mp.pt_side), pl_type=rpt(mp.pl_type),
        light_type=rpt(mp.light_type), chain_id=rpt(mp.chain_id, fill=-1),
        chain_pos=rpt(mp.chain_pos, fill=-1), mask=rpt(mp.mask))
    return Scenario(agents=agents, map=maps, scenario_id=scenario.scenario_id)


def compact_scenario(scenario: Scenario) -> Tuple[Scenario, np.ndarray]:
    """Pack live agent rows into a contiguous prefix (stable order).

    Scenarios resumed from a prior rollout can have live rows scattered
    across high slot indices (insertions fill the first FREE slot, exits
    leave holes), which forces `bucket_for` — which must honor the highest
    real row, not the count — into a large bucket. Compaction permutes the
    agent axis so the N live rows occupy slots [0, N); the rollout is
    permutation-equivariant over agent slots (dense masked attention, no
    positional identity), verified by tests/test_serving.py.

    Returns (compacted scenario, perm) with perm[i] = original row index of
    new row i; map outputs back with `out[...inverse...]` or read new row i
    as original agent perm[i].
    """
    ag = scenario.agents
    mask = np.asarray(ag.slot_mask)
    perm = np.concatenate([np.nonzero(mask)[0], np.nonzero(~mask)[0]])

    def pg(x):
        return np.asarray(x)[perm]

    agents = AgentData(
        valid=pg(ag.valid), position=pg(ag.position),
        elevation=pg(ag.elevation), heading=pg(ag.heading),
        velocity=pg(ag.velocity), shape=pg(ag.shape), type=pg(ag.type),
        slot_mask=pg(ag.slot_mask), train_mask=pg(ag.train_mask),
        av_index=np.asarray(
            int(np.nonzero(perm == int(np.asarray(ag.av_index)))[0][0])))
    return scenario._replace(agents=agents), perm


class RolloutServer:
    """Dispatch scenarios to the smallest compiled rollout that fits them.

    One instance owns the tokenizers and a compile cache keyed by (A, P);
    executables are built lazily on first use (and land in the persistent XLA
    compile cache, so warm processes re-load instead of re-compiling).
    """

    def __init__(self, cfg: Config, attr, motion_tok, map_vocab,
                 agent_buckets: Sequence[int] = (32, 64, 128),
                 map_buckets: Optional[Sequence[int]] = None,
                 agent_headroom: int = 8,
                 num_recurrent_steps: Optional[int] = None,
                 force_insert: bool = False,
                 mesh=None, param_shardings=None,
                 compact: bool = False,
                 bucket_cost_ms: Optional[Dict[int, float]] = None):
        self.cfg = cfg
        self.attr = attr
        self.motion_tok = motion_tok
        self.map_vocab = map_vocab
        self.agent_buckets = sorted(set(
            min(b, cfg.max_agents) for b in agent_buckets) | {cfg.max_agents})
        self.map_buckets = sorted(set(
            min(b, cfg.max_map_tokens) for b in
            (map_buckets or [cfg.max_map_tokens])) | {cfg.max_map_tokens})
        self.agent_headroom = agent_headroom
        self.num_recurrent_steps = num_recurrent_steps
        self.force_insert = force_insert
        # multi-device serving: batches shard over the mesh's `data` axis and
        # params keep the caller's (e.g. tensor-parallel) shardings — the same
        # dp x tp layout as training, but per capacity bucket
        self.mesh = mesh
        self.param_shardings = param_shardings
        # compact live rows into a prefix before bucketing (compact_scenario):
        # scenarios with scattered live slots then fit smaller buckets; each
        # output dict gains "slot_perm" (new row i = original agent
        # slot_perm[i] for initially-live rows; -1 beyond the live count —
        # rows there are padding or rollout-inserted agents with no
        # original-slot identity)
        self.compact = compact
        # measured per-bucket rollout cost (ms) on the serving hardware:
        # capacity alone mis-picks because the agent axis rides the 128-lane
        # dim in the [A, A] attention products, so e.g. A=96 pays near-A=128
        # wall clock while capping insertion capacity (measured on v5e,
        # SWEEPS.md round 5 — the r4 auto-pick chose 96 and LOST to 128).
        # When set, bucket_for picks the cheapest feasible bucket and breaks
        # near-ties (<=3%) toward the LARGER capacity (free headroom).
        # Fill it with calibrate() or a measured table; None = capacity order.
        self.bucket_cost_ms = dict(bucket_cost_ms) if bucket_cost_ms else None
        self._fns: Dict[Tuple[int, int], Tuple] = {}

    def bucket_for(self, scenario: Scenario) -> Tuple[int, int]:
        # highest real row +1, not the count: real rows may be non-contiguous
        slot_mask = np.asarray(scenario.agents.slot_mask)
        pt_mask = np.asarray(scenario.map.mask)
        n_agent = int(np.max(np.nonzero(slot_mask)[0], initial=-1)) + 1
        n_pt = int(np.max(np.nonzero(pt_mask)[0], initial=-1)) + 1
        if n_agent > self.agent_buckets[-1] or n_pt > self.map_buckets[-1]:
            raise ValueError(
                f"scenario needs (A>={n_agent}, P>={n_pt}) but the largest "
                f"bucket is {(self.agent_buckets[-1], self.map_buckets[-1])}")
        need_a = n_agent + self.agent_headroom
        feasible = [b for b in self.agent_buckets
                    if b >= max(need_a, n_agent)] or [self.agent_buckets[-1]]
        costs = self.bucket_cost_ms
        if costs and all(b in costs for b in feasible):
            # cheapest feasible; within 3% of the cheapest, prefer the
            # LARGEST capacity — same wall clock, more insertion headroom
            cmin = min(costs[b] for b in feasible)
            A = max(b for b in feasible if costs[b] <= 1.03 * cmin)
        else:
            A = feasible[0]
        P = next((b for b in self.map_buckets if b >= n_pt),
                 self.map_buckets[-1])
        return A, P

    def calibrate(self, params, scenario: Scenario, rng=None,
                  n_rep: int = 3) -> Dict[int, float]:
        """Measure each agent bucket's rollout wall clock on the current
        device with `params` and a representative scenario, and install the
        table for bucket_for. Compile-then-time; returns {A: ms}."""
        import time as _time
        rng = jax.random.PRNGKey(0) if rng is None else rng
        scenario, _ = self._maybe_compact(scenario)
        P = self.map_buckets[-1]
        slot_mask = np.asarray(scenario.agents.slot_mask)
        n_agent = int(np.max(np.nonzero(slot_mask)[0], initial=-1)) + 1
        table: Dict[int, float] = {}
        for A in self.agent_buckets:
            if A < n_agent:
                continue
            fn, build = self._get(A, P)
            scen = repad_scenario(scenario, A, P)
            inputs = build(scen, rng)
            jax.block_until_ready(fn(params, scen, inputs, rng))
            t0 = _time.perf_counter()
            outs = [fn(params, scen, inputs, rng) for _ in range(n_rep)]
            for o in outs:
                jax.block_until_ready(o)
            table[A] = (_time.perf_counter() - t0) / n_rep * 1e3
        self.bucket_cost_ms = table
        return table

    def _get(self, A: int, P: int):
        key = (A, P)
        if key not in self._fns:
            from infgen_tpu.model.infgen import InfGenModel
            from infgen_tpu.rollout.closed_loop import make_rollout_fn

            cfg = self.cfg.replace(max_agents=A, max_map_tokens=P)
            # params are capacity-independent, so reuse the caller's model
            # module when shapes allow; a fresh module with the bucket cfg
            # produces the identical parameter tree
            model = InfGenModel(cfg, self.attr.grid, self.attr.grid_size,
                                self.attr.angle_size)
            fn = make_rollout_fn(model, cfg, self.attr, self.motion_tok,
                                 self.map_vocab,
                                 num_recurrent_steps=self.num_recurrent_steps,
                                 force_insert=self.force_insert)
            build = jax.jit(lambda s, r: build_model_inputs(
                cfg, self.motion_tok, self.attr, s, r))
            self._fns[key] = (fn, build)
        return self._fns[key]

    def rollout(self, params, scenario: Scenario, rng,
                input_rng=None) -> Dict:
        """Run one scenario at its bucket capacity. Output arrays are shaped
        to the chosen bucket (out["pred_traj"].shape[0] == bucket A)."""
        scenario, perm = self._maybe_compact(scenario)
        A, P = self.bucket_for(scenario)
        fn, build = self._get(A, P)
        scen = repad_scenario(scenario, A, P)
        inputs = build(scen, rng if input_rng is None else input_rng)
        out = fn(params, scen, inputs, rng)
        if perm is not None:
            n_live = int(np.asarray(scenario.agents.slot_mask).sum())
            out = dict(out, slot_perm=self._perm_out(perm, A, n_live))
        return out

    def _maybe_compact(self, scenario: Scenario):
        if not self.compact:
            return scenario, None
        return compact_scenario(scenario)

    @staticmethod
    def _perm_out(perm: np.ndarray, A: int, n_live: int) -> np.ndarray:
        """slot_perm[i] = original row of compacted row i for LIVE rows only;
        -1 beyond the live count (ADVICE r4: compact_scenario's full
        permutation places dead original slots inside the bucket — emitting
        those as non-negative would mis-attribute padded/inserted rows)."""
        out = np.full((A,), -1, np.int64)
        n = min(A, perm.shape[0], n_live)
        out[:n] = perm[:n]
        return out

    def _get_batched(self, A: int, P: int, B: int):
        key = (A, P, B)
        if key not in self._fns:
            fn, build = self._get(A, P)
            vfn = jax.vmap(fn, in_axes=(None, 0, 0, 0))
            if self.mesh is not None and \
                    B % int(self.mesh.shape.get("data", 1)) == 0:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as PSpec
                dshard = NamedSharding(self.mesh, PSpec("data"))
                pshard = self.param_shardings
                if pshard is None:
                    pshard = NamedSharding(self.mesh, PSpec())
                jfn = jax.jit(vfn, in_shardings=(pshard, dshard, dshard,
                                                 dshard))
            else:
                # batch not divisible by the data axis: run replicated
                jfn = jax.jit(vfn)
            self._fns[key] = (jfn, jax.jit(jax.vmap(build)))
        return self._fns[key]

    def rollout_batch(self, params, scenarios: Sequence[Scenario], rngs,
                      input_rngs=None, max_batch: Optional[int] = None,
                      order_by_occupancy: bool = True) -> list:
        """Batched dispatch: group scenarios by capacity bucket, run each
        group through a vmapped executable at the next batch-size bucket
        (powers of two, so compile count stays bounded), and return one
        output dict per scenario in input order.

        `rngs` is either one PRNGKey (split per scenario) or a sequence of
        per-scenario keys. Tail slots of a padded batch re-run the group's
        last scenario and are discarded.

        `max_batch` chunks each bucket group into sub-batches of at most
        that many scenarios. With `order_by_occupancy`, group members are
        sorted by live-agent count (descending) first, so each sub-batch is
        homogeneous in FREE-slot count — the proxy for insertion activity.
        The per-step insertion `while_loop` runs until every vmapped lane
        stops inserting, so one insertion-heavy scene stalls its whole
        sub-batch; homogeneous sub-batches keep the stragglers together
        instead of spreading them across every dispatch (VERDICT r4 item 6;
        reference insertion loop agent_decoder.py:1773-2105).
        """
        from infgen_tpu.train.train_step import stack_scenarios

        n = len(scenarios)

        def norm_keys(keys):
            """One key (legacy uint32 [2] or typed scalar) -> split per
            scenario; a stacked batch / sequence of keys -> as-is."""
            if hasattr(keys, "ndim"):
                is_typed = jnp.issubdtype(keys.dtype, jax.dtypes.prng_key)
                if keys.ndim == (0 if is_typed else 1):
                    keys = jax.random.split(keys, n)
            return list(keys)

        rngs = norm_keys(rngs)
        input_rngs = rngs if input_rngs is None else norm_keys(input_rngs)
        perms = [None] * n
        if self.compact:
            pairs = [compact_scenario(s) for s in scenarios]
            scenarios = [p[0] for p in pairs]
            perms = [p[1] for p in pairs]
        groups: Dict[Tuple[int, int], list] = {}
        for i, s in enumerate(scenarios):
            groups.setdefault(self.bucket_for(s), []).append(i)

        results: list = [None] * n
        for (A, P), idxs in groups.items():
            if order_by_occupancy:
                idxs = sorted(idxs, key=lambda i: -int(
                    np.asarray(scenarios[i].agents.slot_mask).sum()))
            chunk = max_batch or len(idxs)
            for lo in range(0, len(idxs), chunk):
                sub = idxs[lo:lo + chunk]
                B = 1 << (len(sub) - 1).bit_length()   # next power of two
                fn, build = self._get_batched(A, P, B)
                pad = sub + [sub[-1]] * (B - len(sub))
                batch = stack_scenarios(
                    [repad_scenario(scenarios[i], A, P) for i in pad])
                r = jnp.stack([rngs[i] for i in pad])
                ir = jnp.stack([input_rngs[i] for i in pad])
                out = fn(params, batch, build(batch, ir), r)
                for j, i in enumerate(sub):
                    res = jax.tree.map(lambda x, j=j: x[j], out)
                    if perms[i] is not None:
                        n_live = int(np.asarray(
                            scenarios[i].agents.slot_mask).sum())
                        res = dict(res, slot_perm=self._perm_out(
                            perms[i], A, n_live))
                    results[i] = res
        return results
