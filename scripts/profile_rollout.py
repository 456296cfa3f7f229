#!/usr/bin/env python
"""Split single-rollout latency into its structural components on the
current backend: motion-only vs default vs forced insertion, plus an
optional jax.profiler trace.

Usage: python scripts/profile_rollout.py [--steps 300] [--trace DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from infgen_tpu.utils.jax_setup import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np

from infgen_tpu.config import load_config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.model.infgen import InfGenModel
from infgen_tpu.rollout.closed_loop import make_rollout_fn
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from infgen_tpu.tokenizers.vocab import load_map_vocab


def timed(fn, *args, n=8):
    out = fn(*args)
    float(out["pred_traj"].sum())
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        float(o["pred_traj"].sum())
    return (time.perf_counter() - t0) / n * 1e3, outs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="use_fused_block=True (latency-mode trunk kernels)")
    ap.add_argument("--colk", action="store_true",
                    help="use_column_kernel=True (single-dispatch trunk column)")
    ap.add_argument("--sknf", action="store_true",
                    help="use_seed_kernel_full=True (precompute in-kernel)")
    ap.add_argument("--refk", action="store_true",
                    help="use_refine_kernel=True (fused per-insert refine)")
    ap.add_argument("--latency", action="store_true",
                    help="all latency-mode kernels (== configs/"
                         "ours_long_term_latency.yaml)")
    ap.add_argument("--unroll", type=int, default=0,
                    help="override rollout_scan_unroll (0 = keep config)")
    ap.add_argument("--bucket", type=int, default=0,
                    help="occupancy bucket: rerun at max_agents=BUCKET via "
                         "rollout/serving.py repadding (0 = off)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "configs", "ours_long_term.yaml"))
    cfg = cfg.replace(num_recurrent_steps_val=args.steps)
    if args.unroll:
        cfg = cfg.replace(rollout_scan_unroll=args.unroll)
    if args.fused:
        cfg = cfg.replace(use_fused_block=True)
    if args.colk:
        cfg = cfg.replace(use_column_kernel=True)
    if args.sknf:
        cfg = cfg.replace(use_seed_kernel_full=True)
    if args.refk:
        cfg = cfg.replace(use_refine_kernel=True)
    if args.latency:
        cfg = cfg.replace(use_seed_kernel_full=True, use_refine_kernel=True,
                          use_column_kernel=True)
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    map_vocab = load_map_vocab()
    scen = make_synthetic_scenario(cfg, seed=0, num_agents=64)
    inputs = jax.block_until_ready(jax.jit(
        lambda s, r: build_model_inputs(cfg, mt, attr, s, r))(
            scen, jax.random.PRNGKey(0)))

    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scen.map, mt.vocab, map_vocab["traj_src"],
        jax.random.PRNGKey(2), deterministic=True)
    params = variables["params"]
    rng = jax.random.PRNGKey(3)

    res = {}
    variants = {
        "motion_only": dict(cfg=cfg.replace(disable_insertion=True)),
        "eval_only": dict(cfg=cfg.replace(insert_limit=0)),   # 1 seed eval/step
        "one_insert": dict(cfg=cfg.replace(insert_limit=1)),
        "default": dict(cfg=cfg),
        "forced": dict(cfg=cfg, force_insert=True),
    }
    for name, kw in variants.items():
        c = kw.pop("cfg")
        fn = make_rollout_fn(model, c, attr, mt, map_vocab, **kw)
        ms, out = timed(fn, params, scen, inputs, rng)
        res[name] = dict(ms=round(ms, 1),
                         inserted=int(np.asarray(out["n_inserted"])),
                         ms_per_step=round(ms / (args.steps // 5), 3))
        print(f"{name}: {json.dumps(res[name])}", flush=True)

    if args.bucket:
        from infgen_tpu.rollout.serving import repad_scenario
        cfg_b = cfg.replace(max_agents=args.bucket)
        scen_b = repad_scenario(scen, args.bucket, cfg.max_map_tokens)
        inputs_b = jax.block_until_ready(jax.jit(
            lambda s, r: build_model_inputs(cfg_b, mt, attr, s, r))(
                scen_b, jax.random.PRNGKey(0)))
        model_b = InfGenModel(cfg_b, attr.grid, attr.grid_size,
                              attr.angle_size)
        fn = make_rollout_fn(model_b, cfg_b, attr, mt, map_vocab)
        ms, out = timed(fn, params, scen_b, inputs_b, rng)
        res[f"bucket_{args.bucket}"] = dict(
            ms=round(ms, 1), inserted=int(np.asarray(out["n_inserted"])),
            ms_per_step=round(ms / (args.steps // 5), 3))
        print(f"bucket_{args.bucket}: "
              f"{json.dumps(res[f'bucket_{args.bucket}'])}", flush=True)

    if args.trace:
        fn = make_rollout_fn(model, cfg, attr, mt, map_vocab)
        out = fn(params, scen, inputs, rng)
        float(out["pred_traj"].sum())
        with jax.profiler.trace(args.trace):
            out = fn(params, scen, inputs, rng)
            float(out["pred_traj"].sum())
        print(f"trace written to {args.trace}")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
