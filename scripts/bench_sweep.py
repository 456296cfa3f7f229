#!/usr/bin/env python
"""Named perf experiments on the current backend, one JSON line each.

bench.py is the driver-facing headline; this is the engineer-facing sweep
tool behind BENCH/README numbers (batch-size sweep, insertion loop form,
refine-candidate cap, trained-params throughput, bucketed sparse serving).
Reports dt and active agent-steps separately so numerator effects (how many
agents the model keeps active) are never conflated with denominator effects
(how fast the program runs).

Usage:
  python scripts/bench_sweep.py default_b8 trained_b8 trained_b8_fixed \
      [--reps 10] [--train-steps 400]
  python scripts/bench_sweep.py --list

Trained parameters (400 synthetic steps, same recipe as bench.py) are cached
in /tmp so repeated sweeps skip retraining; delete the cache after changing
training code.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.utils.jax_setup import enable_compile_cache

enable_compile_cache()

from infgen_tpu.config import load_config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.model.infgen import InfGenModel
from infgen_tpu.rollout.closed_loop import make_rollout_fn
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from infgen_tpu.tokenizers.vocab import load_map_vocab

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_CACHE = "/tmp/infgen_bench_trained_params.npz"


def _truncate_map(scen, cap):
    """Zero out real map tokens beyond `cap` (mask + fields), host-side."""
    mp = scen.map
    keep = np.arange(np.asarray(mp.mask).shape[0]) < cap
    f = {k: np.where(
        keep.reshape((-1,) + (1,) * (np.asarray(getattr(mp, k)).ndim - 1)),
        np.asarray(getattr(mp, k)), 0)
        for k in ("position", "orientation", "token_idx", "pt_type",
                  "pt_side", "pl_type", "light_type")}
    f["chain_id"] = np.where(keep, np.asarray(mp.chain_id), -1)
    f["chain_pos"] = np.where(keep, np.asarray(mp.chain_pos), -1)
    f["mask"] = np.asarray(mp.mask) & keep
    return scen._replace(map=type(mp)(**f))


def flat_save(path, params):
    flat = {"/".join(str(k.key) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(path, **flat)


def flat_load(path, like):
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    vals = [jnp.asarray(data["/".join(str(k.key) for k in p)])
            for p, _ in leaves]
    return jax.tree_util.tree_unflatten(treedef, vals)


class Bench:
    def __init__(self, reps, train_steps):
        self.reps = reps
        self.train_steps = train_steps
        self.cfg = load_config(os.path.join(ROOT, "configs",
                                            "ours_long_term.yaml"))
        self.attr = AttrTokenizer(self.cfg.grid_range, self.cfg.grid_interval,
                                  self.cfg.pl2seed_radius,
                                  self.cfg.angle_interval)
        self.mt = MotionTokenizer()
        self.map_vocab = load_map_vocab()
        self._params = None
        self._trained = None

    def scenes(self, B, num_agents):
        cfg = self.cfg
        from infgen_tpu.train.train_step import stack_scenarios
        scens = [make_synthetic_scenario(cfg, seed=s, num_agents=num_agents)
                 for s in range(B)]
        return scens, stack_scenarios(scens)

    def inputs_for(self, cfg, batch, B):
        rngs = jax.random.split(jax.random.PRNGKey(0), B)
        build = jax.jit(jax.vmap(
            lambda s, r: build_model_inputs(cfg, self.mt, self.attr, s, r)))
        return jax.block_until_ready(build(batch, rngs)), rngs

    def params(self):
        if self._params is None:
            cfg = self.cfg
            scens, batch = self.scenes(1, 64)
            inputs, _ = self.inputs_for(cfg, batch, 1)
            model = InfGenModel(cfg, self.attr.grid, self.attr.grid_size,
                                self.attr.angle_size)
            one_in = jax.tree.map(lambda x: x[0], inputs)
            one_sc = jax.tree.map(lambda x: x[0], batch)
            variables = jax.jit(model.init,
                                static_argnames=("deterministic",))(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                one_in, one_sc.map, self.mt.vocab,
                self.map_vocab["traj_src"], jax.random.PRNGKey(2),
                deterministic=True)
            self._params = variables["params"]
        return self._params

    def trained_params(self):
        if self._trained is None:
            base = self.params()
            if os.path.exists(TRAIN_CACHE):
                self._trained = flat_load(TRAIN_CACHE, base)
            else:
                from infgen_tpu.train.train_step import (Trainer,
                                                         stack_scenarios)
                scens, _ = self.scenes(8, 64)
                trainer = Trainer(self.cfg)
                state = trainer.replicate_state(
                    trainer.init_state(jax.random.PRNGKey(0), scens[0]))
                tb = [trainer.shard_batch(
                    stack_scenarios([scens[i], scens[i + 1]]))
                    for i in range(0, 6, 2)]
                for step in range(self.train_steps):
                    state, _ = trainer.train_step(
                        state, tb[step % len(tb)],
                        np.array([1, step], np.uint32))
                self._trained = jax.device_get(state.params)
                flat_save(TRAIN_CACHE, self._trained)
        return self._trained

    def measure_wosac(self, name, B=8, num_agents=64, reps=None):
        """On-device WOSAC scoring throughput (reference: CPU process pool,
        compute_metrics.py:1754-1801).

        Three numbers: (a) scoring a batch of finished rollouts (vmapped
        compute_metric_features + compute_scenario_metrics under one jit),
        (b) the rollout program alone, (c) rollout + scoring FUSED in one
        compiled program (trajectories are scored without ever leaving HBM).
        Log histograms come from the same scenes' GT features, built on
        device too.
        """
        from infgen_tpu.metrics.features import compute_metric_features
        from infgen_tpu.metrics.wosac import (WosacConfig,
                                              compute_scenario_metrics,
                                              make_log_distributions)
        cfg = self.cfg
        reps = reps or self.reps
        wcfg = WosacConfig()
        scens, batch = self.scenes(B, num_agents)
        inputs, rngs = self.inputs_for(cfg, batch, B)
        model = InfGenModel(cfg, self.attr.grid, self.attr.grid_size,
                            self.attr.angle_size)
        fn = make_rollout_fn(model, cfg, self.attr, self.mt, self.map_vocab,
                             jit=False)
        params = jax.device_put(self.trained_params())
        jax.block_until_ready(params)

        # log histograms from the same scenes' GT (dump+aggregate analog,
        # offline.py:44-86) — all on device, one jit
        def gt_feats(scen, inp):
            return compute_metric_features(
                scen.agents.position[..., :2], scen.agents.heading,
                scen.agents.valid, scen.agents.shape[:, 0],
                scen.agents.shape[:, 1], scen.agents.slot_mask,
                scen.agents.av_index, inp.tokens.token_pos,
                inp.tokens.state_idx, traj_z=scen.agents.elevation)

        def build_log_dist(batch, inputs):
            g = jax.vmap(gt_feats)(batch, inputs)
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), g)
            return make_log_distributions(wcfg, flat)
        log_dist = jax.block_until_ready(
            jax.jit(build_log_dist)(batch, inputs))

        # log_dist is a traced ARGUMENT, never a closure capture: on the
        # axon relay, closure-captured constants cost ~40 ms/call per scored
        # field (vs 0.14 ms as an argument) — the whole scoring batch went
        # 648 ms -> ~1 ms when log_dist moved into the signature.
        def score_one(ld, o):
            sim = compute_metric_features(
                o["pred_traj"], o["pred_head"], o["pred_valid"],
                o["eval_shape"][:, 0], o["eval_shape"][:, 1],
                o["slot_active"], o["av_index"], o["pos_a"],
                o["next_state_idx"])
            return compute_scenario_metrics(wcfg, ld, sim)

        batched = jax.jit(jax.vmap(fn, in_axes=(None, 0, 0, 0)))
        score_j = jax.jit(jax.vmap(score_one, in_axes=(None, 0)))

        def roll_and_score(params, ld, scen, inp, rng):
            return score_one(ld, fn(params, scen, inp, rng))
        fused = jax.jit(jax.vmap(roll_and_score,
                                 in_axes=(None, None, 0, 0, 0)))

        def timed(call, drain, n):
            out = call(0)
            drain(out)
            t0 = time.perf_counter()
            outs = [call(10 + i) for i in range(n)]
            for o in outs:
                drain(o)
            return (time.perf_counter() - t0) / n, outs[-1]

        keys = lambda i: jax.random.split(jax.random.PRNGKey(i), B)
        dt_roll, out = timed(lambda i: batched(params, batch, inputs, keys(i)),
                             lambda o: float(o["pred_traj"].sum()), reps)
        out_dev = jax.block_until_ready(out)
        dt_score, m = timed(lambda i: score_j(log_dist, out_dev),
                            lambda o: float(o["metametric"].sum()), reps)
        dt_fused, mf = timed(
            lambda i: fused(params, log_dist, batch, inputs, keys(i)),
            lambda o: float(o["metametric"].sum()), reps)
        rec = {
            "exp": name, "B": B, "A": int(cfg.max_agents),
            "score_ms_per_batch": round(dt_score * 1e3, 2),
            "score_scenarios_per_sec": round(B / dt_score, 1),
            "rollout_ms": round(dt_roll * 1e3, 1),
            "rollout_plus_score_ms": round(dt_fused * 1e3, 1),
            "fused_overhead_ms": round((dt_fused - dt_roll) * 1e3, 1),
            "metametric_mean": round(float(np.mean(
                np.asarray(mf["metametric"]))), 4),
            "reps": reps,
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure_serving_mix(self, name, sizes=(8, 16, 32, 64), per_size=8,
                            reps=None):
        """Mixed-fleet serving: scenarios of different live-agent counts
        dispatched by RolloutServer (grouped per capacity bucket, batched
        per group) vs everything through the full A=128 program in B=8
        chunks. The realistic serving workload: real WOMD scenes span
        8..128 agents (meta filter, scalable_dataset.py:48-67), and a
        fixed-capacity program prices every scene at 128 slots.
        """
        from infgen_tpu.rollout.serving import RolloutServer
        cfg = self.cfg
        reps = reps or max(2, self.reps // 3)
        scens = []
        for na in sizes:
            for s in range(per_size):
                scens.append(make_synthetic_scenario(
                    cfg, seed=1000 * na + s, num_agents=na))
        n = len(scens)
        params = jax.device_put(self.trained_params())
        jax.block_until_ready(params)
        key = jax.random.PRNGKey(0)

        def run_server(server):
            outs = server.rollout_batch(params, scens,
                                        jax.random.split(key, n))
            for o in outs:
                float(o["pred_traj"].sum())
            t0 = time.perf_counter()
            for i in range(reps):
                outs = server.rollout_batch(
                    params, scens, jax.random.split(
                        jax.random.PRNGKey(10 + i), n))
                for o in outs:
                    float(o["pred_traj"].sum())
            dt = (time.perf_counter() - t0) / reps
            asteps = float(np.sum([
                (np.asarray(o["pred_state"])[:, cfg.num_historical_steps:]
                 != 0).sum() for o in outs]))
            return dt, asteps

        bucketed = RolloutServer(cfg, self.attr, self.mt, self.map_vocab,
                                 agent_buckets=(16, 32, 64, 128))
        full = RolloutServer(cfg, self.attr, self.mt, self.map_vocab,
                             agent_buckets=(cfg.max_agents,))
        dt_b, asteps_b = run_server(bucketed)
        dt_f, asteps_f = run_server(full)
        rec = {
            "exp": name, "n_scenarios": n,
            "sizes": list(sizes), "per_size": per_size,
            "bucketed_s": round(dt_b, 3),
            "full_s": round(dt_f, 3),
            "speedup": round(dt_f / dt_b, 2),
            "scenarios_per_sec_bucketed": round(n / dt_b, 1),
            "scenarios_per_sec_full": round(n / dt_f, 1),
            "agent_steps_per_sec_bucketed": round(asteps_b / dt_b, 1),
            "agent_steps_per_sec_full": round(asteps_f / dt_f, 1),
            "reps": reps,
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure_stream(self, name, B=8, num_agents=64, total_steps=900,
                       segment_steps=300, buckets=(32, 64, 128), reps=None,
                       rebucket=True):
        """Trained long-horizon streamed throughput (VERDICT r4 item 3):
        stream a fleet of B scenarios over >= 60 s of simulated time through
        StreamingRollout.run_batch. With `rebucket`, exited agents' slots are
        compacted between segments and scenes migrate to smaller capacity
        buckets as the trained model moderates occupancy; the control
        (rebucket=False) streams the same protocol pinned at A=max (the
        static program's capacity — what a non-re-bucketing runtime pays).
        The numerator is active agent-steps from the stitched states, so
        capacity caps are priced in, not hidden.
        """
        from infgen_tpu.config import INVALID_STATE
        from infgen_tpu.rollout.serving import RolloutServer
        from infgen_tpu.rollout.streaming import StreamingRollout
        cfg = self.cfg
        reps = reps or max(2, self.reps // 5)
        scens, _ = self.scenes(B, num_agents)
        params = jax.device_put(self.trained_params())
        jax.block_until_ready(params)
        Hs = cfg.num_historical_steps
        srv = RolloutServer(
            cfg, self.attr, self.mt, self.map_vocab,
            agent_buckets=tuple(buckets) if rebucket else (cfg.max_agents,),
            agent_headroom=8, num_recurrent_steps=segment_steps)
        stream = StreamingRollout(srv, segment_steps=segment_steps)

        def once(seed):
            return stream.run_batch(
                params, scens,
                list(jax.random.split(jax.random.PRNGKey(seed), B)),
                total_steps=total_steps)

        # warm with the SAME seeds the timed loop uses: with rebucket, the
        # bucket/batch-shape combos VISITED depend on each seed's insertion
        # draws, so warming with a different seed can leave executables
        # uncompiled and put multi-minute compiles inside the timing (the
        # r5 first-cut rebucket number, 120 s/rep, was exactly this)
        for i in range(reps):
            once(10 + i)
        t0 = time.perf_counter()
        for i in range(reps):
            results = once(10 + i)
        dt = (time.perf_counter() - t0) / reps
        asteps = float(np.sum([(r["state"][:, Hs:] != INVALID_STATE).sum()
                               for r in results]))
        rec = {
            "exp": name, "B": B, "total_steps": total_steps,
            "segment_steps": segment_steps, "rebucket": rebucket,
            "agent_steps_per_sec": round(asteps / dt, 1),
            "dt_s": round(dt, 3),
            "asteps": round(asteps, 0),
            "segment_buckets": [s["bucket"]
                                for s in results[0]["segments"]],
            "n_alive_per_segment": [s["n_alive"]
                                    for s in results[0]["segments"]],
            "reps": reps, "trained": True,
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure_stream_fused(self, name, B=8, num_agents=64, total_steps=900,
                             segment_steps=300, plan=((128, 1), (64, 2)),
                             reps=None):
        """Fused on-device streaming (rollout/streaming.py make_stream_fn):
        each chunk of the plan runs (bucket A, n_segments) as ONE compiled
        vmapped program; only the [A, Hs] continuation AgentData crosses the
        host boundary between chunks (compact + re-pad to the next bucket).
        plan=((A_max, n_seg),) is the static control — one dispatch for the
        whole horizon. Numerator/drain conventions match measure()."""
        from infgen_tpu.config import INVALID_STATE
        from infgen_tpu.rollout.streaming import make_chunked_stream_runner
        cfg0 = self.cfg
        reps = reps or max(2, self.reps // 5)
        assert sum(n for _, n in plan) * segment_steps >= total_steps
        scens0, _ = self.scenes(B, num_agents)
        params = jax.device_put(self.trained_params())
        jax.block_until_ready(params)
        Hs = cfg0.num_historical_steps

        # shared chunked driver (also used by bench.py): lazy per-(A, n_seg)
        # executables, incl. the full-capacity fallback path
        runner = make_chunked_stream_runner(cfg0, self.attr, self.mt,
                                            self.map_vocab,
                                            segment_steps=segment_steps)

        def run_once(seed):
            outs, buckets = runner(params, scens0, plan,
                                   jax.random.PRNGKey(seed))
            float(outs[-1]["pred_traj"].sum())         # drain
            return outs, buckets

        for i in range(reps):                  # warm every executable the
            run_once(10 + i)                   # timed seeds will visit
        rep_outs = []
        t0 = time.perf_counter()
        for i in range(reps):
            outs, buckets = run_once(10 + i)
            rep_outs.append(outs)              # device arrays; fetch after
        dt = (time.perf_counter() - t0) / reps
        # numerator averaged over the SAME reps the clock timed (last-rep-
        # only biased the ratio: insertion draws differ per seed)
        asteps = float(sum(
            (np.asarray(o["pred_state"])[:, :, :, Hs:] != INVALID_STATE)
            .sum() for outs in rep_outs for o in outs)) / reps
        n_alive = [int(a) for o in rep_outs[-1]
                   for a in np.asarray(o["slot_active"]).sum(-1).mean(0)]
        rec = {
            "exp": name, "B": B, "total_steps": total_steps,
            "segment_steps": segment_steps,
            "plan": [list(p) for p in plan],
            "buckets_used": buckets,
            "agent_steps_per_sec": round(asteps / dt, 1),
            "dt_s": round(dt, 3),
            "asteps": round(asteps, 0),
            "n_alive_per_segment": n_alive,
            "reps": reps, "trained": True, "fused": True,
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure_homog(self, name, max_batch=8, ordered=True, per_size=8,
                      sizes=(16, 48, 80, 112), reps=None):
        """Insertion-homogeneous batching A/B (VERDICT r4 item 6): scenes of
        mixed occupancy all run the FULL A=128 program (single bucket, so
        bucket wins can't confound), chunked into vmapped sub-batches of
        `max_batch`. ordered=True sorts lanes by live count so each
        sub-batch is homogeneous in free slots (the insertion while_loop
        runs to the slowest lane); ordered=False interleaves sizes —
        the adversarial ordering a naive queue produces.
        """
        from infgen_tpu.rollout.serving import RolloutServer
        cfg = self.cfg
        reps = reps or max(2, self.reps // 3)
        scens = []
        # round-robin over sizes = maximally heterogeneous arrival order
        for s in range(per_size):
            for na in sizes:
                scens.append(make_synthetic_scenario(
                    cfg, seed=1000 * na + s, num_agents=na))
        n = len(scens)
        params = jax.device_put(self.trained_params())
        jax.block_until_ready(params)
        Hs = cfg.num_historical_steps
        srv = RolloutServer(cfg, self.attr, self.mt, self.map_vocab,
                            agent_buckets=(cfg.max_agents,))

        def once(seed):
            return srv.rollout_batch(
                params, scens, jax.random.split(jax.random.PRNGKey(seed), n),
                max_batch=max_batch, order_by_occupancy=ordered)

        outs = once(0)
        t0 = time.perf_counter()
        for i in range(reps):
            outs = once(10 + i)
            for o in outs:
                float(np.asarray(o["pred_traj"]).sum())
        dt = (time.perf_counter() - t0) / reps
        asteps = float(np.sum([
            (np.asarray(o["pred_state"])[:, Hs:] != 0).sum() for o in outs]))
        rec = {
            "exp": name, "n_scenarios": n, "max_batch": max_batch,
            "ordered": ordered, "sizes": list(sizes),
            "agent_steps_per_sec": round(asteps / dt, 1),
            "dt_s": round(dt, 3), "reps": reps, "trained": True,
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure_train(self, name, batch_size=2, steps=30, remat=None,
                      reps=None):
        """Train-step throughput at a given global batch size (one chip:
        the batch axis is pure vmap; the DP mesh shards it across devices
        unchanged). Reports s/step and scenarios/s. remat overrides
        cfg.remat_attention (default-on trades ~20% step time for the
        activation memory that lets batch >= 8 fit in 16 GB HBM)."""
        from infgen_tpu.train.train_step import Trainer, stack_scenarios
        cfg = self.cfg
        if remat is not None:
            cfg = cfg.replace(remat_attention=remat)
        scens, _ = self.scenes(batch_size, 64)
        trainer = Trainer(cfg)
        state = trainer.replicate_state(
            trainer.init_state(jax.random.PRNGKey(0), scens[0]))
        tb = trainer.shard_batch(stack_scenarios(scens))
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, tb,
                                            np.array([1, 0], np.uint32))
        float(jax.tree_util.tree_leaves(metrics)[0])
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = trainer.train_step(
                state, tb, np.array([1, 1 + i], np.uint32))
        float(jax.tree_util.tree_leaves(metrics)[0])  # drain the queue once
        dt = (time.perf_counter() - t0) / steps
        rec = {
            "exp": name, "batch_size": batch_size,
            "s_per_step": round(dt, 4),
            "scenarios_per_sec": round(batch_size / dt, 2),
            "remat_attention": bool(cfg.remat_attention),
            "steps": steps, "warm_s": round(t_compile, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure_mfu(self, name, hidden_dim=128, batch_size=4, steps=10):
        """Train-step MFU at a given model width (VERDICT r3 weak #3 asks
        whether 0.4% MFU is the framework or the model: the reference model
        is d=128 / ~5 M params, far below MXU saturation by construction;
        this measures the SAME code at wider d)."""
        from infgen_tpu.train.train_step import Trainer, stack_scenarios
        scale = hidden_dim // 128
        cfg = self.cfg.replace(hidden_dim=hidden_dim,
                               head_dim=16 * scale)
        scens, _ = self.scenes(batch_size, 64)
        trainer = Trainer(cfg)
        state = trainer.replicate_state(
            trainer.init_state(jax.random.PRNGKey(0), scens[0]))
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree_util.tree_leaves(state.params))
        tb = trainer.shard_batch(stack_scenarios(scens))
        state, metrics = trainer.train_step(state, tb,
                                            np.array([1, 0], np.uint32))
        float(jax.tree_util.tree_leaves(metrics)[0])
        flops = None
        try:
            ca = trainer._jit_step.lower(
                state, tb, np.array([1, 1], np.uint32)
            ).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception:
            pass
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = trainer.train_step(
                state, tb, np.array([1, 1 + i], np.uint32))
        float(jax.tree_util.tree_leaves(metrics)[0])
        dt = (time.perf_counter() - t0) / steps
        rec = {
            "exp": name, "hidden_dim": hidden_dim,
            "batch_size": batch_size, "n_params": n_params,
            "s_per_step": round(dt, 4),
            "flops_per_step": flops,
            "mfu_vs_bf16_peak": None if not flops
            else round(flops / dt / 197e12, 5),
        }
        print(json.dumps(rec), flush=True)
        return rec

    def measure(self, name, cfg=None, B=8, num_agents=64, trained=False,
                bucket=None, map_cap=None, force_insert=False, reps=None):
        """Compile + run one experiment; print one JSON line.

        bucket: agent-capacity bucket A, or an (A, P) tuple for a map bucket
        too. map_cap truncates each scenario's real map tokens to the cap
        (host-side) so a P < 1024 bucket is legal — the synthetic generator
        saturates the map (824 real tokens), unlike real sparse scenes.
        """
        cfg = cfg or self.cfg
        reps = reps or self.reps
        scens, batch = self.scenes(B, num_agents)
        if map_cap is not None:
            scens = [_truncate_map(s, map_cap) for s in scens]
        if bucket is not None:
            from infgen_tpu.rollout.serving import repad_scenario
            A_b, P_b = bucket if isinstance(bucket, tuple) \
                else (bucket, cfg.max_map_tokens)
            cfg = cfg.replace(max_agents=A_b, max_map_tokens=P_b)
            scens = [repad_scenario(s, A_b, P_b) for s in scens]
        if map_cap is not None or bucket is not None:
            from infgen_tpu.train.train_step import stack_scenarios
            batch = stack_scenarios(scens)
        inputs, rngs = self.inputs_for(cfg, batch, B)
        model = InfGenModel(cfg, self.attr.grid, self.attr.grid_size,
                            self.attr.angle_size)
        fn = make_rollout_fn(model, cfg, self.attr, self.mt, self.map_vocab,
                             jit=False, force_insert=force_insert)
        batched = jax.jit(jax.vmap(fn, in_axes=(None, 0, 0, 0)))
        # params ON DEVICE before timing: host-resident params re-upload the
        # whole tree over the relay on EVERY call (bench.py r3's trained
        # number did exactly that — noise-dominated and ~4x pessimistic)
        params = jax.device_put(
            self.trained_params() if trained else self.params())
        jax.block_until_ready(params)
        Hs = cfg.num_historical_steps

        t0 = time.perf_counter()
        out = batched(params, batch, inputs,
                      jax.random.split(jax.random.PRNGKey(0), B))
        float(out["pred_traj"].sum())
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [batched(params, batch, inputs,
                        jax.random.split(jax.random.PRNGKey(10 + i), B))
                for i in range(reps)]
        for o in outs:
            float(o["pred_traj"].sum())
        dt = (time.perf_counter() - t0) / reps
        per = [float((np.asarray(o["pred_state"])[:, :, Hs:] != 0).sum())
               for o in outs]
        asteps = float(np.mean(per))
        R = np.asarray(outs[-1]["pred_state"]).shape[-1] - Hs
        rec = {
            "exp": name, "B": B, "A": int(cfg.max_agents),
            "num_agents0": num_agents,
            "agent_steps_per_sec": round(asteps / dt, 1),
            "dt_ms": round(dt * 1e3, 2),
            "asteps_per_batch": round(asteps, 0),
            "mean_active": round(asteps / (R * B), 1),
            "agents_final": int(np.asarray(outs[-1]["slot_active"]).sum()),
            "reps": reps, "warm_s": round(t_compile, 1),
            "trained": trained,
            "fixed_trip": bool(cfg.insertion_fixed_trip),
            "nc": int(cfg.refine_map_candidates),
        }
        print(json.dumps(rec), flush=True)
        return rec


def experiments(b):
    cfg = b.cfg
    fixed = cfg.replace(insertion_fixed_trip=True)
    return {
        # batch-size sweep, default (untrained) params, while vs fixed trip
        "default_b8": lambda: b.measure("default_b8", B=8),
        "default_b16": lambda: b.measure("default_b16", B=16),
        "default_b32": lambda: b.measure("default_b32", B=32, reps=4),
        "fixed_b8": lambda: b.measure("fixed_b8", cfg=fixed, B=8),
        "fixed_b16": lambda: b.measure("fixed_b16", cfg=fixed, B=16),
        "fixed_b32": lambda: b.measure("fixed_b32", cfg=fixed, B=32, reps=4),
        # trained params (realistic insertion load)
        "trained_b8": lambda: b.measure("trained_b8", B=8, trained=True),
        "trained_b16": lambda: b.measure("trained_b16", B=16, trained=True),
        "trained_b32": lambda: b.measure("trained_b32", B=32, trained=True,
                                         reps=4),
        "trained_b8_fixed": lambda: b.measure("trained_b8_fixed", cfg=fixed,
                                              B=8, trained=True),
        "trained_b16_fixed": lambda: b.measure("trained_b16_fixed", cfg=fixed,
                                               B=16, trained=True),
        "trained_b32_fixed": lambda: b.measure("trained_b32_fixed", cfg=fixed,
                                               B=32, trained=True, reps=4),
        # on-device WOSAC scoring (reference: CPU process pool)
        "wosac_score": lambda: b.measure_wosac("wosac_score", B=8),
        # trained streamed long-horizon throughput: re-bucketing fleet vs
        # the same stream pinned at A=128 (VERDICT r4 item 3)
        "stream_rebucket": lambda: b.measure_stream("stream_rebucket",
                                                    rebucket=True),
        "stream_static": lambda: b.measure_stream("stream_static",
                                                  rebucket=False),
        # fused on-device streaming: the whole horizon in one dispatch per
        # chunk (static control = single chunk at A=128; rebucket = migrate
        # the fleet to A=64 after the first segment's exits)
        "stream_fused_static": lambda: b.measure_stream_fused(
            "stream_fused_static", plan=((128, 3),)),
        "stream_fused_rebucket": lambda: b.measure_stream_fused(
            "stream_fused_rebucket", plan=((128, 1), (64, 2))),
        # dense-traffic stream: 96-live scenes — same program cost at
        # A=128, higher numerator (occupancy is what caps streamed
        # agent-steps/s once the handoff overhead is gone)
        "stream_fused_dense": lambda: b.measure_stream_fused(
            "stream_fused_dense", num_agents=96, plan=((128, 3),)),
        # insertion-homogeneous batching A/B at several vmap widths
        # (VERDICT r4 item 6): ordered lanes vs interleaved arrival order
        "homog_b8": lambda: b.measure_homog("homog_b8", max_batch=8,
                                            ordered=True),
        "homog_b8_shuf": lambda: b.measure_homog("homog_b8_shuf",
                                                 max_batch=8, ordered=False),
        "homog_b16": lambda: b.measure_homog("homog_b16", max_batch=16,
                                             ordered=True),
        "homog_b16_shuf": lambda: b.measure_homog("homog_b16_shuf",
                                                  max_batch=16,
                                                  ordered=False),
        "homog_b32": lambda: b.measure_homog("homog_b32", max_batch=32,
                                             ordered=True),
        "homog_b32_shuf": lambda: b.measure_homog("homog_b32_shuf",
                                                  max_batch=32,
                                                  ordered=False),
        # mixed-fleet bucketed serving vs one full-capacity program
        "serving_mix": lambda: b.measure_serving_mix("serving_mix"),
        # rollout scan unroll: overlap per-step prep with the previous
        # step's trunk (carry dependence is serial; compile time ~x unroll)
        "default_b8_unroll2": lambda: b.measure(
            "default_b8_unroll2", cfg=cfg.replace(rollout_scan_unroll=2), B=8),
        "trained_b8_unroll2": lambda: b.measure(
            "trained_b8_unroll2", cfg=cfg.replace(rollout_scan_unroll=2), B=8,
            trained=True),
        # refine-candidate cap A/B under trained insertion load
        "trained_b8_nc0": lambda: b.measure(
            "trained_b8_nc0", cfg=cfg.replace(refine_map_candidates=0), B=8,
            trained=True),
        # latency-preset kernels under trained vmap-8 load (insertion-heavy:
        # do the fused insert-path kernels pay for themselves at B=8?)
        "trained_b8_refk": lambda: b.measure(
            "trained_b8_refk", cfg=cfg.replace(use_refine_kernel=True), B=8,
            trained=True),
        "trained_b8_sknf": lambda: b.measure(
            "trained_b8_sknf", cfg=cfg.replace(use_seed_kernel_full=True),
            B=8, trained=True),
        "trained_b8_latency_cfg": lambda: b.measure(
            "trained_b8_latency_cfg",
            cfg=cfg.replace(use_seed_kernel_full=True, use_refine_kernel=True,
                            use_column_kernel=True), B=8, trained=True),
        # forced-insert dt bound at full capacity
        "forced_b8": lambda: b.measure("forced_b8", B=8, force_insert=True),
        # sparse scenes (16 live agents): full-capacity program vs bucketed
        "sparse_full": lambda: b.measure("sparse_full", B=8, num_agents=16,
                                         trained=True),
        "sparse_bucket32": lambda: b.measure("sparse_bucket32", B=8,
                                             num_agents=16, trained=True,
                                             bucket=32),
        "sparse_bucket48": lambda: b.measure("sparse_bucket48", B=8,
                                             num_agents=16, trained=True,
                                             bucket=48),
        "sparse_full_untrained": lambda: b.measure(
            "sparse_full_untrained", B=8, num_agents=16),
        "sparse_bucket32_untrained": lambda: b.measure(
            "sparse_bucket32_untrained", B=8, num_agents=16, bucket=32),
        # motion-only sparse serving: insertion off isolates the pure
        # occupancy effect (equal numerators both sides — with insertion on,
        # the model fills whatever capacity it gets, so value comparisons
        # conflate capacity with speed)
        "sparse_motion_full": lambda: b.measure(
            "sparse_motion_full", cfg=cfg.replace(disable_insertion=True),
            B=8, num_agents=16, trained=True),
        "sparse_motion_bucket32": lambda: b.measure(
            "sparse_motion_bucket32", cfg=cfg.replace(disable_insertion=True),
            B=8, num_agents=16, trained=True, bucket=32),
        "motion_full_64": lambda: b.measure(
            "motion_full_64", cfg=cfg.replace(disable_insertion=True),
            B=8, num_agents=64, trained=True),
        # sparse map + sparse agents: real low-occupancy scenes have few map
        # tokens too; (A=32, P=256) vs the full program on the SAME
        # truncated-map scenes, motion-only for equal numerators
        "sparsemap_motion_full": lambda: b.measure(
            "sparsemap_motion_full", cfg=cfg.replace(disable_insertion=True),
            B=8, num_agents=16, trained=True, map_cap=256),
        "sparsemap_motion_bucket": lambda: b.measure(
            "sparsemap_motion_bucket",
            cfg=cfg.replace(disable_insertion=True), B=8, num_agents=16,
            trained=True, map_cap=256, bucket=(32, 256)),
        # sparse-bucket batch scaling: motion-only lanes never diverge (no
        # insertion while_loop), so larger B may keep amortizing dispatch
        # where the insertion-on sweep stalled at B=8
        "sparse_motion_bucket32_b16": lambda: b.measure(
            "sparse_motion_bucket32_b16",
            cfg=cfg.replace(disable_insertion=True), B=16, num_agents=16,
            trained=True, bucket=32),
        "sparse_motion_bucket32_b32": lambda: b.measure(
            "sparse_motion_bucket32_b32",
            cfg=cfg.replace(disable_insertion=True), B=32, num_agents=16,
            trained=True, bucket=32, reps=4),
        "sparse_motion_bucket32_b64": lambda: b.measure(
            "sparse_motion_bucket32_b64",
            cfg=cfg.replace(disable_insertion=True), B=64, num_agents=16,
            trained=True, bucket=32, reps=3),
        "motion_full_64_b16": lambda: b.measure(
            "motion_full_64_b16", cfg=cfg.replace(disable_insertion=True),
            B=16, num_agents=64, trained=True),
        "motion_full_64_b32": lambda: b.measure(
            "motion_full_64_b32", cfg=cfg.replace(disable_insertion=True),
            B=32, num_agents=64, trained=True, reps=4),
        # train-step batch scaling (one chip; remat default-on)
        "train_b2": lambda: b.measure_train("train_b2", batch_size=2),
        "train_b4": lambda: b.measure_train("train_b4", batch_size=4),
        "train_b8": lambda: b.measure_train("train_b8", batch_size=8),
        "train_b16": lambda: b.measure_train("train_b16", batch_size=16,
                                             steps=15),
        "train_b2_noremat": lambda: b.measure_train(
            "train_b2_noremat", batch_size=2, remat=False),
        "train_b4_noremat": lambda: b.measure_train(
            "train_b4_noremat", batch_size=4, remat=False),
        # train-step MFU vs model width (same code, wider d: is the 0.4%
        # rollout MFU the framework or the reference's ~5 M-param model?)
        "mfu_d128": lambda: b.measure_mfu("mfu_d128", hidden_dim=128),
        "mfu_d256": lambda: b.measure_mfu("mfu_d256", hidden_dim=256),
        "mfu_d512": lambda: b.measure_mfu("mfu_d512", hidden_dim=512),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exps", nargs="*")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--train-steps", type=int, default=400)
    args = ap.parse_args()
    b = Bench(args.reps, args.train_steps)
    exps = experiments(b)
    if args.list or not args.exps:
        print("\n".join(exps))
        return
    for e in args.exps:
        if e not in exps:
            print(f"unknown experiment {e}", file=sys.stderr)
            continue
        exps[e]()


if __name__ == "__main__":
    main()
