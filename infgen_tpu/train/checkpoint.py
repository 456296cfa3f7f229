"""Checkpointing via orbax: full-state resume + weights-only warm start.

Mirrors the reference's two modes (run.py:119-126, model/infgen.py:876-916):
  - save/restore full TrainState (params + optimizer + step), keep top-k
  - `load_weights` warm start that silently skips missing / shape-mismatched
    entries like load_state_from_file.
"""

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1000, best_fn=None,
                 best_mode: str = "min"):
        """best_fn: optional metrics-dict -> float; when given, orbax keeps
        the max_to_keep BEST checkpoints by that value (pass metrics= to
        save()) instead of the most recent — the monitored-checkpoint mode
        (reference ModelCheckpoint save_top_k/monitor, run.py:119-126)."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=1 if best_fn else save_interval_steps,
            best_fn=best_fn,
            best_mode=best_mode,
            create=True,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, force: bool = False,
             metrics: Optional[dict] = None) -> bool:
        """force=True bypasses orbax's internal should_save re-check —
        REQUIRED for terminal saves: CheckpointManager.save() silently
        discards steps off the save interval otherwise, so an end-of-training
        save at e.g. step 800 with interval 1000 would be a no-op and resume
        would restore near-initial weights. A forced save of an
        already-persisted step (e.g. max_steps lands exactly on the save
        interval, or step 0 after the InitialSavePolicy) is a no-op instead
        of orbax's StepAlreadyExistsError."""
        if force and step in set(self.mgr.all_steps()):
            return False
        return self.mgr.save(step, args=ocp.args.StandardSave(state),
                             force=force, metrics=metrics)

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        return self.mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_raw(self, step: Optional[int] = None):
        """Restore without a template: returns the checkpoint as saved (a raw
        pytree), so shape/tree mismatches don't raise — feed `load_weights`
        for the reference's non-strict warm start (model/infgen.py:876-916)."""
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        return self.mgr.restore(step, args=ocp.args.StandardRestore(None))

    def should_save(self, step: int) -> bool:
        """Whether orbax would actually persist at `step` — callers gate the
        device_get snapshot on this so the hot loop doesn't pay a full
        state transfer for steps orbax discards."""
        return bool(self.mgr.should_save(step))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def wait(self):
        self.mgr.wait_until_finished()


def load_weights(params_template, ckpt_params) -> Any:
    """Non-strict weights-only load: keep template entries whose checkpoint
    counterpart is missing or shape-mismatched (model/infgen.py:894-906)."""
    t_paths, t_def = jax.tree_util.tree_flatten_with_path(params_template)
    c_map = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_flatten_with_path(ckpt_params)[0]}
    out = []
    skipped = []
    for path, tval in t_paths:
        key = jax.tree_util.keystr(path)
        cval = c_map.get(key)
        if cval is not None and np.shape(cval) == np.shape(tval):
            out.append(cval)
        else:
            skipped.append(key)
            out.append(tval)
    if skipped:
        print(f"load_weights: kept {len(skipped)} template entries "
              f"(missing/mismatched): {skipped[:5]}{'...' if len(skipped) > 5 else ''}")
    return jax.tree_util.tree_unflatten(t_def, out)
