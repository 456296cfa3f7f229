#!/usr/bin/env python
"""Measure the reference InfGen inference throughput in-container (CPU torch)
and the repo rollout on the same CPU, producing the measured baseline that
replaces bench.py's former estimate (VERDICT round-1 item #3).

The reference model runs unmodified from /root/reference via the pure-torch
pyg stubs (tests/pyg_stubs.py); weights are untrained (throughput does not
depend on weight values, only on the insertion count, which is reported and
used to normalize into active agent-steps/s).

Modes timed:
  motion  — disable_insertion=True: pure motion rollout (repo analog: the
            "motion-only" number)
  insert  — default: untrained seed head decides insertions
  forced  — DEBUG=1: every insertion iteration inserts (reference
            agent_decoder.py:1888-1889), bounding trained-model cost

Usage: python scripts/bench_reference.py [--steps 300] [--agents 32] [--skip-repo]
Writes BASELINE_MEASURED.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # env JAX_PLATFORMS=axon is pinned

from infgen_tpu.utils.jax_setup import enable_compile_cache

enable_compile_cache()

import numpy as np
import torch

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from tests import ref_bridge

torch.set_num_threads(os.cpu_count() or 8)


def bench_reference(cfg, scenario, inputs, mt, mode, steps):
    ref_dec, _ = ref_bridge.make_ref_decoder(cfg)
    ref_dec.num_recurrent_steps_val = steps
    ref_dec.disable_insertion = mode == "motion"
    if mode == "forced":
        os.environ["DEBUG"] = "1"
    else:
        os.environ.pop("DEBUG", None)

    data = ref_bridge.build_ref_data(cfg, scenario, inputs, mt)
    data["agent"]["heading"] = torch.zeros_like(data["agent"]["valid_mask"],
                                                dtype=torch.float32)
    P = data["pt_token"]["num_nodes"]
    x_pt = torch.randn(P, cfg.hidden_dim)

    torch.manual_seed(0)
    t0 = time.perf_counter()
    with torch.no_grad():
        out = ref_dec.inference(data, {"x_pt": x_pt})
    dt = time.perf_counter() - t0

    # active agent-10Hz-steps over the rollout window (state 0 = invalid)
    asteps = int((out["pred_state"][:, cfg.num_historical_steps:] != 0).sum())
    n_final = out["pred_traj"].shape[0]
    return dict(mode=mode, wall_s=round(dt, 2), agents_final=int(n_final),
                active_agent_steps=asteps,
                agent_steps_per_sec=round(asteps / dt, 1))


def bench_repo_cpu(cfg, scenario, inputs, steps):
    """Repo rollout, single scenario, same CPU — apples-to-apples ratio."""
    from infgen_tpu.model.infgen import InfGenModel
    from infgen_tpu.rollout.closed_loop import make_rollout_fn
    from infgen_tpu.tokenizers.vocab import load_map_vocab

    cfg = cfg.replace(num_recurrent_steps_val=steps)
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scenario.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    rollout = jax.jit(make_rollout_fn(model, cfg, attr, mt, map_vocab, jit=False))
    out = rollout(variables["params"], scenario, inputs, jax.random.PRNGKey(3))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n_rep = 3
    for i in range(n_rep):
        out = rollout(variables["params"], scenario, inputs,
                      jax.random.PRNGKey(10 + i))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    n_agents = int(np.asarray(out["slot_active"]).sum())
    # active agent-steps counted exactly like the reference modes above:
    # non-invalid 10 Hz states over the future window
    asteps = int((np.asarray(out["pred_state"])[:, cfg.num_historical_steps:]
                  != 0).sum())
    return dict(mode="repo_cpu", wall_s=round(dt, 2), agents_final=n_agents,
                active_agent_steps=asteps,
                agent_steps_per_sec=round(asteps / dt, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--agents", type=int, default=32)
    ap.add_argument("--skip-repo", action="store_true")
    ap.add_argument("--modes", default="motion,insert,forced")
    args = ap.parse_args()

    cfg = Config(num_recurrent_steps_val=args.steps)
    scenario = make_synthetic_scenario(cfg, seed=0, num_agents=args.agents)
    # keep only agents valid at the history boundary: the reference's
    # inference filter assumes its dataset guarantees this (its
    # batch_size_a bookkeeping at agent_decoder.py:1648-1650 miscounts
    # otherwise and crashes on agents filtered after av_index)
    ag = scenario.agents
    keep = np.asarray(ag.slot_mask) & np.asarray(ag.valid)[:, 5] \
        & np.asarray(ag.valid)[:, 10]
    agent_arrays = dict(
        valid=np.asarray(ag.valid)[keep], position=np.asarray(ag.position)[keep],
        heading=np.asarray(ag.heading)[keep], velocity=np.asarray(ag.velocity)[keep],
        shape=np.asarray(ag.shape)[keep], type=np.asarray(ag.type)[keep],
        av_index=0, train_mask=np.asarray(ag.train_mask)[keep])
    pmask = np.asarray(scenario.map.mask)
    map_arrays = {f: np.asarray(getattr(scenario.map, f))[pmask]
                  for f in ("position", "orientation", "token_idx", "pt_type",
                            "pt_side", "pl_type", "light_type", "chain_id",
                            "chain_pos")}
    from infgen_tpu.data.scenario import build_scenario
    scenario = build_scenario(agent_arrays, map_arrays, cfg.max_agents,
                              cfg.max_map_tokens)
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    inputs = build_model_inputs(cfg, mt, attr, scenario, jax.random.PRNGKey(0))
    inputs = jax.tree.map(np.asarray, inputs)

    results = {"steps": args.steps, "agents": args.agents,
               "torch_threads": torch.get_num_threads()}
    for mode in args.modes.split(","):
        if mode == "repo_cpu":
            continue
        r = bench_reference(cfg, scenario, inputs, mt, mode, args.steps)
        print(json.dumps(r), flush=True)
        results[mode] = r
    if not args.skip_repo:
        r = bench_repo_cpu(cfg, scenario, inputs, args.steps)
        print(json.dumps(r), flush=True)
        results["repo_cpu"] = r

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
