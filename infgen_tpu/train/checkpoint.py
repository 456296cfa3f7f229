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
                 save_interval_steps: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            create=True,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state) -> bool:
        return self.mgr.save(step, args=ocp.args.StandardSave(state))

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
