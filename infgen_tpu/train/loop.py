"""Training / validation loop driver.

The Lightning Trainer equivalent (reference run.py:100-146): epoch loop,
data-parallel sharded steps, periodic checkpointing, closed-loop validation
with on-device WOSAC scoring.
"""

import json
import os
import time
from typing import Callable, Iterator, List, Optional

import jax
import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.data.scenario import Scenario
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.train.checkpoint import CheckpointManager
from infgen_tpu.train.train_step import Trainer, stack_scenarios


class SyntheticDataset:
    """Deterministic synthetic scenario stream for smoke training runs."""

    def __init__(self, cfg: Config, size: int = 64):
        self.cfg = cfg
        self.size = size
        self._cache = {}

    def __len__(self):
        return self.size

    def __getitem__(self, i: int) -> Scenario:
        if i not in self._cache:
            self._cache[i] = make_synthetic_scenario(self.cfg, seed=i)
        return self._cache[i]

    def iter_batches(self, batch_size: int, shuffle: bool = True,
                     seed: int = 0) -> Iterator[List[Scenario]]:
        order = np.arange(self.size)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, self.size - batch_size + 1, batch_size):
            yield [self[j] for j in order[i:i + batch_size]]


def train(cfg: Config, dataset, save_dir: str = "runs/default",
          max_steps: Optional[int] = None, log_every: int = 10,
          resume: bool = True, log_fn: Callable = print):
    """Run training; returns the final TrainState."""
    trainer = Trainer(cfg)
    n_dev = trainer.mesh.devices.size
    batch_size = max(cfg.train_batch_size, 1) * n_dev

    rng = jax.random.PRNGKey(cfg.seed)
    state = trainer.init_state(rng, dataset[0])
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))
    if resume and ckpt.latest_step() is not None:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            log_fn(f"resumed from step {int(state.step)}")
    state = trainer.replicate_state(state)

    metrics_log = open(os.path.join(save_dir, "metrics.jsonl"), "a") \
        if save_dir else None
    os.makedirs(save_dir, exist_ok=True)

    step = int(np.asarray(state.step))
    t_last = time.perf_counter()
    for epoch in range(cfg.max_epochs):
        for batch_list in dataset.iter_batches(batch_size, shuffle=True,
                                               seed=cfg.seed + epoch):
            rng, sub = jax.random.split(rng)
            batch = trainer.shard_batch(stack_scenarios(batch_list))
            state, logs = trainer.train_step(state, batch, sub)
            step += 1
            if step % log_every == 0:
                logs = {k: float(v) for k, v in logs.items()}
                dt = (time.perf_counter() - t_last) / log_every
                t_last = time.perf_counter()
                logs.update(step=step, epoch=epoch, sec_per_step=round(dt, 3))
                log_fn(f"step {step}: loss={logs['loss']:.4f} "
                       f"({dt:.2f}s/step)")
                if metrics_log:
                    metrics_log.write(json.dumps(logs) + "\n")
                    metrics_log.flush()
            ckpt.save(step, jax.device_get(state))
            if max_steps and step >= max_steps:
                ckpt.wait()
                return state
    ckpt.wait()
    return state
