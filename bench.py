#!/usr/bin/env python
"""Benchmark: closed-loop rollout agent-steps/sec on the current backend.

Prints ONE JSON line:
  {"metric": "agent_steps_per_sec", "value": N, "unit": "agent*10Hz-steps/s",
   "vs_baseline": N}

Workload: the flagship long-term config (hidden 128, 6 agent layers, 2048
motion vocab, agent insertion enabled), 8 vmapped 30 s closed-loop WOMD-scale
rollouts (300 future 10 Hz steps = 60 token steps each), 128 padded agent
slots — matching configs/ours_long_term.yaml:74 and BASELINE.md. Throughput
is mildly data-dependent: the insertion while_loop exits early once the seed
head stops proposing agents.

Baseline: the reference publishes no numbers (BASELINE.md). We use an
estimated reference GPU throughput of 1,280 agent-steps/s: the reference
python loop rebuilds radius graphs + runs 18 attention layers per token step
and is observed/reported to take ~0.5 s per token step at ~128 agents
(agent_decoder.py:1740-2301 does ~36 edge builds and 10 insertion passes per
step); 128 agents * 300 steps / (60 * 0.5 s) = 1,280. Replace with a measured
number when reference hardware is available.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from infgen_tpu.utils.jax_setup import enable_compile_cache

enable_compile_cache()

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.model.infgen import InfGenModel
from infgen_tpu.rollout.closed_loop import make_rollout_fn
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from infgen_tpu.tokenizers.vocab import load_map_vocab

REFERENCE_AGENT_STEPS_PER_SEC = 1280.0  # estimated; see module docstring


def main():
    cfg = Config()  # flagship ours_long_term equivalent
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()

    # batched rollout: the reference cannot batch inference (bs=1 only,
    # agent_decoder.py:1647); we vmap B scenarios on one chip.
    B = 8
    from infgen_tpu.train.train_step import stack_scenarios
    scens = [make_synthetic_scenario(cfg, seed=s, num_agents=64)
             for s in range(B)]
    batch = stack_scenarios(scens)
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    build = jax.jit(jax.vmap(lambda s, r: build_model_inputs(cfg, mt, attr, s, r)))
    inputs = jax.block_until_ready(build(batch, rngs))

    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    one_in = jax.tree.map(lambda x: x[0], inputs)
    one_sc = jax.tree.map(lambda x: x[0], batch)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        one_in, one_sc.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    params = variables["params"]

    rollout = make_rollout_fn(model, cfg, attr, mt, map_vocab, jit=False)
    batched = jax.jit(jax.vmap(lambda s, i, r: rollout(params, s, i, r)))

    # compile + force real completion (block_until_ready can be a no-op on
    # remote-relay backends; pulling a scalar to host is reliable)
    out = batched(batch, inputs, rngs)
    float(out["pred_traj"].sum())

    # sustained measurement: dispatch n_rep batched rollouts back-to-back
    # (the device queue serializes them) and drain once at the end, so
    # per-fetch relay latency is amortized out of the per-rollout number
    n_rep = 6
    t0 = time.perf_counter()
    outs = [batched(batch, inputs,
                    jax.random.split(jax.random.PRNGKey(10 + i), B))
            for i in range(n_rep)]
    for o in outs:
        float(o["pred_traj"].sum())
    dt = (time.perf_counter() - t0) / n_rep

    n_agents = int(np.asarray(out["slot_active"]).sum())
    agent_steps = n_agents * cfg.num_recurrent_steps_val
    value = agent_steps / dt

    print(json.dumps({
        "metric": "agent_steps_per_sec",
        "value": round(value, 1),
        "unit": "agent*10Hz-steps/s",
        "vs_baseline": round(value / REFERENCE_AGENT_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
