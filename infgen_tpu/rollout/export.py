"""AOT export of the closed-loop rollout as a serialized StableHLO artifact.

Production serving wants the simulator as a deployable artifact, not a Python
tracing session: `jax.export` serializes the jitted rollout (static shapes —
exactly what the fixed-capacity design guarantees) so a server can
deserialize and call it without the model/tokenizer code or a re-trace. The
reference has no equivalent (its inference is a Python loop over torch
modules, agent_decoder.py:1605-2389).

The artifact is keyed by capacity (A, P) like the serving buckets
(rollout/serving.py); parameters stay an argument, so one artifact serves any
checkpoint of the same architecture.
"""

import os
from typing import Optional

import jax
import jax.export
import numpy as np


def _register_pytrees():
    """Register the framework's NamedTuple pytrees for export serialization
    (idempotent: re-registration raises, so already-registered is a no-op)."""
    from infgen_tpu.data.features import ModelInputs
    from infgen_tpu.data.scenario import AgentData, MapData, Scenario
    from infgen_tpu.tokenizers.motion_tokenizer import TokenizedAgents

    for cls in (AgentData, MapData, Scenario, TokenizedAgents, ModelInputs):
        try:
            jax.export.register_namedtuple_serialization(
                cls, serialized_name=f"infgen_tpu.{cls.__name__}")
        except ValueError:
            pass


_register_pytrees()


def export_rollout(cfg, attr, motion_tok, map_vocab, scenario, inputs, rng,
                   params, num_recurrent_steps: Optional[int] = None,
                   platforms: Optional[list] = None) -> bytes:
    """Serialize the rollout program for `cfg`'s (A, P) capacity.

    `scenario`/`inputs`/`rng`/`params` are shape templates — any pytrees with
    the right shapes/dtypes work. `platforms` e.g. ["tpu"] or ["cpu"];
    defaults to the current backend.
    """
    from infgen_tpu.model.infgen import InfGenModel
    from infgen_tpu.rollout.closed_loop import make_rollout_fn

    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    fn = make_rollout_fn(model, cfg, attr, motion_tok, map_vocab,
                         num_recurrent_steps=num_recurrent_steps, jit=False)
    kw = {} if platforms is None else {"platforms": platforms}
    exported = jax.export.export(jax.jit(fn), **kw)(
        params, scenario, inputs, rng)
    return exported.serialize()


def save_rollout_artifact(path: str, blob: bytes) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_rollout_artifact(path_or_blob):
    """Deserialize an exported rollout; returns `fn(params, scenario, inputs,
    rng) -> dict` (jit-callable — composes with vmap-free batching by
    dispatching several calls back-to-back)."""
    blob = path_or_blob
    if isinstance(path_or_blob, (str, os.PathLike)):
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    return jax.jit(exported.call)
