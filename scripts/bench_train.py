#!/usr/bin/env python
"""Train-step benchmark: sustained s/step on the current backend.

Flagship config, synthetic scenarios, measured AFTER compile over `--steps`
steps with the batch staged ahead (data reuse — this measures compute, not
input). Knobs: INFGEN_BENCH_BF16=1, INFGEN_BENCH_PALLAS=1, --batch N.

Reference point: the torch reference trains batch-1-per-GPU; round-1 state
was ~0.44 s/step at batch 2 on the remote TPU incl. relay transfers
(CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from infgen_tpu.utils.jax_setup import enable_compile_cache

enable_compile_cache()

from infgen_tpu.config import Config
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.train.train_step import Trainer, stack_scenarios


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    cfg = Config()
    if os.environ.get("INFGEN_BENCH_PALLAS"):
        cfg = cfg.replace(use_pallas_attention=True)
    if os.environ.get("INFGEN_BENCH_BF16"):
        cfg = cfg.replace(compute_dtype="bfloat16")
    if os.environ.get("INFGEN_BENCH_NO_REMAT"):
        cfg = cfg.replace(remat_attention=False)

    trainer = Trainer(cfg)
    scens = [make_synthetic_scenario(cfg, seed=s, num_agents=64)
             for s in range(args.batch)]
    state = trainer.replicate_state(
        trainer.init_state(jax.random.PRNGKey(0), scens[0]))
    batch = trainer.shard_batch(stack_scenarios(scens))

    import numpy as np

    # host-side raw keys: eager split would add a relay roundtrip per step
    key = lambda i: np.array([1, i], np.uint32)
    # compile + 2 warmup steps
    for i in range(2):
        state, logs = trainer.train_step(state, batch, key(i))
    float(logs["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, logs = trainer.train_step(state, batch, key(100 + i))
    loss = float(logs["loss"])  # drains the queue
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "metric": "train_sec_per_step",
        "value": round(dt, 4),
        "batch": args.batch,
        "loss": round(loss, 4),
        "compute_dtype": cfg.compute_dtype,
        "pallas": bool(cfg.use_pallas_attention),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
