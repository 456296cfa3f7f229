"""Training / validation loop driver.

The Lightning Trainer equivalent (reference run.py:100-146): epoch loop,
data-parallel sharded steps, periodic checkpointing, closed-loop validation
with on-device WOSAC scoring.
"""

import json
import os
import time
from typing import Callable, Optional

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


class OverfitDataset:
    """One fixed batch, repeated — the reference's OVERFIT debug mode
    (run.py:111-113). Length equals the batch size, so every epoch yields
    exactly that batch (shuffle only permutes within it). Module-level so
    spawn loader workers can pickle it."""

    def __init__(self, dataset, batch_size: int):
        self._items = [dataset[i] for i in range(batch_size)]

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i: int):
        return self._items[i]


def train(cfg: Config, dataset, save_dir: str = "runs/default",
          max_steps: Optional[int] = None, log_every: int = 10,
          resume: bool = True, log_fn: Optional[Callable] = None,
          pretrain_ckpt: Optional[str] = None, val_dataset=None):
    """Run training; returns the final TrainState.

    val_dataset enables periodic open-loop validation every
    cfg.val_every_n_epochs epochs (reference check_val_every_n_epoch=1,
    run.py:136) with val records in metrics.jsonl and best-k monitored
    checkpoints (val loss) in <save_dir>/ckpt_best alongside the recency /
    interval checkpoints in <save_dir>/ckpt (run.py:119-126)."""
    import dataclasses

    from infgen_tpu.utils.backup import backup_source
    from infgen_tpu.utils.logging import get_logger, maybe_wandb_init

    os.makedirs(save_dir, exist_ok=True)
    backup_source(save_dir)  # run.py:17-48 source snapshot

    # observability tier (reference: rank-aware logger utils/func.py:125 +
    # wandb scalars run.py:93-96, project 'simagent'); wandb is a no-op
    # offline or when the package is absent
    logger = get_logger(log_file=os.path.join(save_dir, "train.log"))
    if log_fn is None:
        log_fn = logger.info
    wandb_run = maybe_wandb_init("simagent", dataclasses.asdict(cfg))

    # profiling tier: INFGEN_PROFILE=<dir> captures a jax.profiler trace of
    # steps 10-14 (past compilation); StepTimer splits input vs step time
    from infgen_tpu.utils.profiling import StepTimer, device_memory_stats
    profile_dir = os.environ.get("INFGEN_PROFILE")
    timer = StepTimer()
    trace_on = False
    steps_this_run = 0  # local counter: resumed runs restart at step>10

    trainer = Trainer(cfg)
    # global batch = per-device batch x data-axis size (model-axis devices
    # hold shards of the same replica, not extra batch rows)
    n_dev = int(trainer.mesh.shape.get("data", trainer.mesh.devices.size))
    batch_size = max(cfg.train_batch_size, 1) * n_dev

    rng = jax.random.PRNGKey(cfg.seed)
    state = trainer.init_state(rng, dataset[0])
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))
    ckpt_best = None
    if val_dataset is not None and cfg.val_every_n_epochs > 0:
        # monitored best-k checkpoints by validation loss (reference
        # ModelCheckpoint save_top_k=5 / monitor, run.py:119-126)
        ckpt_best = CheckpointManager(
            os.path.join(save_dir, "ckpt_best"), max_to_keep=5,
            best_fn=lambda m: m["val_loss"], best_mode="min")
    if pretrain_ckpt:
        # weights-only non-strict warm start (reference run.py --pretrain_ckpt
        # -> load_state_from_file, model/infgen.py:876-916): restore RAW so a
        # mismatched tree/shape doesn't raise before load_weights can filter
        from infgen_tpu.train.checkpoint import load_weights
        raw = CheckpointManager(pretrain_ckpt).restore_raw()
        if raw is not None:
            src_params = (raw.get("params", raw) if isinstance(raw, dict)
                          else getattr(raw, "params", raw))
            state = state._replace(
                params=load_weights(jax.device_get(state.params), src_params))
            log_fn(f"warm-started weights from {pretrain_ckpt}")
    if resume and ckpt.latest_step() is not None:
        try:
            restored = ckpt.restore(state)
        except Exception as e:  # param-tree drift (e.g. a head added since
            # the checkpoint was written): fall back to a non-strict
            # weights-only warm start rather than crash — optimizer state
            # and step restart fresh, which the log calls out loudly
            from infgen_tpu.train.checkpoint import load_weights
            raw = ckpt.restore_raw()
            restored = None
            if raw is not None:
                src = raw.get("params", raw) if isinstance(raw, dict) \
                    else getattr(raw, "params", raw)
                state = state._replace(params=load_weights(
                    jax.device_get(state.params), src))
                log_fn("resume: checkpoint tree mismatches the current "
                       f"model ({type(e).__name__}); warm-started weights "
                       "only — optimizer state and step reset")
        if restored is not None:
            state = restored
            log_fn(f"resumed from step {int(state.step)}")
    state = trainer.replicate_state(state)

    metrics_log = open(os.path.join(save_dir, "metrics.jsonl"), "a") \
        if save_dir else None
    os.makedirs(save_dir, exist_ok=True)

    step = int(np.asarray(state.step))
    t_last = time.perf_counter()

    from infgen_tpu.data.loader import BatchLoader, staged

    loader = BatchLoader(dataset, batch_size, num_workers=cfg.num_workers,
                         prefetch_batches=cfg.prefetch_batches)

    def staged_batches(epoch):
        """Worker-pool scenario building + deep prefetch: device_put is
        async, so staging `prefetch_batches` ahead while steps run hides
        host->device transfer (which dominates wall time on remote TPU
        backends)."""
        return staged(
            loader.epoch(shuffle=True, seed=cfg.seed + epoch),
            lambda bl: trainer.shard_batch(stack_scenarios(bl)),
            depth=cfg.prefetch_batches)

    try:
        for epoch in range(cfg.max_epochs):
            it = iter(staged_batches(epoch))
            while True:
                with timer.phase("input"):
                    batch = next(it, None)
                if batch is None:
                    break
                if profile_dir and steps_this_run == 10 and not trace_on:
                    jax.profiler.start_trace(profile_dir)
                    trace_on = True
                # host-side raw key (seed, step): an eager jax.random.split
                # here would dispatch one tiny device program per step over
                # the remote relay
                sub = np.array([cfg.seed, step], np.uint32)
                with timer.phase("step"):
                    state, logs = trainer.train_step(state, batch, sub)
                if trace_on and steps_this_run >= 14:
                    jax.block_until_ready(logs["loss"])
                    jax.profiler.stop_trace()
                    trace_on = False
                    log_fn(f"profiler trace written to {profile_dir}")
                step += 1
                steps_this_run += 1
                if step % log_every == 0:
                    logs = {k: float(v) for k, v in logs.items()}
                    dt = (time.perf_counter() - t_last) / log_every
                    t_last = time.perf_counter()
                    in_t = timer.totals["input"]
                    tot_t = in_t + timer.totals["step"]
                    logs.update(step=step, epoch=epoch,
                                sec_per_step=round(dt, 3),
                                input_frac=round(in_t / max(tot_t, 1e-9), 3))
                    log_fn(f"step {step}: loss={logs['loss']:.4f} "
                           f"({dt:.2f}s/step, input {logs['input_frac']:.0%})")
                    if metrics_log:
                        metrics_log.write(json.dumps(logs) + "\n")
                        metrics_log.flush()
                    if wandb_run is not None:
                        wandb_run.log(logs, step=step)
                # gate the full-state device_get on orbax actually persisting
                # (it discards non-interval steps; the transfer is the cost)
                if ckpt.should_save(step):
                    ckpt.save(step, jax.device_get(state))
                if max_steps and step >= max_steps:
                    # force: orbax's internal should_save would silently
                    # discard an off-interval terminal step (see
                    # CheckpointManager.save)
                    ckpt.save(step, jax.device_get(state), force=True)
                    ckpt.wait()
                    return state
            if ckpt_best is not None and (epoch + 1) % cfg.val_every_n_epochs == 0:
                val_out = validate_open_loop(
                    trainer, state, val_dataset,
                    num_scenarios=cfg.val_num_scenarios, log_fn=log_fn)
                val_rec = {f"val/{k}": round(float(v), 6)
                           for k, v in val_out.items()}
                val_rec.update(step=step, epoch=epoch)
                if metrics_log:
                    metrics_log.write(json.dumps(val_rec) + "\n")
                    metrics_log.flush()
                if wandb_run is not None:
                    wandb_run.log(val_rec, step=step)
                ckpt_best.save(step, jax.device_get(state), force=True,
                               metrics={"val_loss": float(val_out["loss"])})
        ckpt.save(step, jax.device_get(state), force=True)
        ckpt.wait()
        return state
    finally:
        loader.close()
        if trace_on:
            jax.profiler.stop_trace()
            log_fn(f"profiler trace written to {profile_dir}")
        if timer.counts.get("step"):
            log_fn("phase timings:\n" + timer.summary())
            log_fn(f"device memory: {device_memory_stats()}")


def validate_open_loop(trainer: Trainer, state, dataset, num_scenarios: int = 8,
                       log_fn: Callable = print):
    """Open-loop validation: deterministic forward losses + token/state
    accuracy (reference val_open_loop, model/infgen.py:627-686)."""
    import jax.numpy as jnp

    from infgen_tpu.data.features import build_model_inputs
    from infgen_tpu.metrics.train_metrics import token_cls_accuracy
    from infgen_tpu.train.targets import roll_targets, token_state_eval_masks

    cfg = trainer.cfg

    @jax.jit
    def eval_one(params, scenario, rng):
        loss, logs = trainer.loss_fn(params, scenario, rng, deterministic=True)
        inputs = build_model_inputs(cfg, trainer.motion_tok, trainer.attr,
                                    scenario, rng)
        pred = trainer.model.apply(
            {"params": params}, inputs, scenario.map, trainer.motion_tok.vocab,
            trainer.map_vocab["traj_src"], rng, deterministic=True)
        tok_gt, state_gt = roll_targets(inputs.tokens.token_idx,
                                        inputs.tokens.state_idx)
        tok_mask, state_mask = token_state_eval_masks(
            inputs.tokens.raw_token_valid, inputs.tokens.state_idx,
            inputs.av_index, inputs.slot_mask)
        tok_top1 = jnp.argmax(pred["next_token_logits"], -1)[..., None]
        st_top1 = jnp.argmax(pred["next_state_logits"], -1)[..., None]
        acc_s, acc_n = token_cls_accuracy(tok_top1, tok_gt, tok_mask)
        sacc_s, sacc_n = token_cls_accuracy(st_top1, state_gt, state_mask)
        logs.update(token_acc_sum=acc_s, token_acc_count=acc_n,
                    state_acc_sum=sacc_s, state_acc_count=sacc_n)
        return logs

    params = state.params
    totals = {}
    rng = jax.random.PRNGKey(cfg.seed + 99)
    n = min(num_scenarios, len(dataset))
    for i in range(n):
        rng, sub = jax.random.split(rng)
        logs = eval_one(params, dataset[i], sub)
        for k, v in logs.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    out = {k: v / n for k, v in totals.items() if not k.endswith(("_sum", "_count"))}
    out["token_accuracy"] = totals.get("token_acc_sum", 0) / max(
        totals.get("token_acc_count", 1), 1)
    out["state_accuracy"] = totals.get("state_acc_sum", 0) / max(
        totals.get("state_acc_count", 1), 1)
    log_fn("open-loop val: " + " ".join(
        f"{k}={v:.4f}" for k, v in sorted(out.items())
        if k in ("loss", "token_cls_loss", "state_cls_loss",
                 "token_accuracy", "state_accuracy")))
    return out


def check_inputs(cfg: Config, dataset, num_scenarios: int = 8,
                 log_fn: Callable = print):
    """Validate the tokenization pipeline itself on GT data: StateAccuracy +
    GridOverlapRate over tokenized inputs (reference CHECK_INPUTS mode,
    model/infgen.py:229-247)."""
    import jax.numpy as jnp

    from infgen_tpu.data.features import build_model_inputs
    from infgen_tpu.metrics.train_metrics import grid_overlap_rate, state_accuracy
    from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
    from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer

    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    build = jax.jit(lambda s, r: build_model_inputs(cfg, mt, attr, s, r))

    totals = dict(valid_sum=0, valid_count=0, invalid_sum=0, invalid_count=0)
    overlap = None
    for i in range(min(num_scenarios, len(dataset))):
        inputs = build(dataset[i], jax.random.PRNGKey(i))
        if i == 0 and os.environ.get("PLOT_EDGE"):
            # edge-map debug plots (reference PLOT_EDGE env mode,
            # agent_decoder.py:636,672): dense masks instead of edge lists
            from infgen_tpu.model import edges as E
            from infgen_tpu.utils.visualization import plot_attention_masks

            tok = inputs.tokens
            _, hv = E.build_motion_vectors(tok.token_pos, tok.token_heading,
                                           tok.state_idx)
            interact = (tok.raw_token_valid |
                        (tok.state_idx == 2)) & inputs.slot_mask[:, None]
            a2a = E.build_a2a_edges(tok.token_pos, tok.token_heading,
                                    tok.state_idx, hv, interact,
                                    cfg.a2a_radius)
            hist = E.training_hist_mask(tok.raw_token_valid, tok.state_idx,
                                        None) & inputs.slot_mask[:, None]
            temporal = E.build_temporal_edges(
                tok.token_pos, tok.token_heading, tok.state_idx, hv, hist,
                cfg.time_span // cfg.shift)
            plot_attention_masks(
                "check_inputs",
                {"a2a": np.asarray(a2a.mask),
                 "temporal": np.asarray(temporal.mask)},
                os.environ.get("PLOT_EDGE_DIR", "runs/edge_maps"))
        sa = state_accuracy(inputs.tokens.state_idx)
        for k in totals:
            totals[k] += int(sa[k])
        go = grid_overlap_rate(inputs.tokens.state_idx, inputs.grid_token_idx,
                               attr.grid_size, cfg.num_seed_feature)
        go = {k: np.asarray(v) for k, v in go.items()}
        overlap = go if overlap is None else {
            k: overlap[k] + go[k] for k in go}

    log_fn(f"StateAccuracy: valid={totals['valid_sum']}/{totals['valid_count']} "
           f"invalid={totals['invalid_sum']}/{totals['invalid_count']}")
    rate = overlap["num_overlap_t"].sum() / max(
        overlap["num_insert_agent_t"].sum(), 1)
    log_fn(f"GridOverlapRate: {rate:.4f} "
           f"(overlaps={int(overlap['num_overlap_t'].sum())}, "
           f"inserts={int(overlap['num_insert_agent_t'].sum())})")
    return totals, overlap
