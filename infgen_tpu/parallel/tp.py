"""Megatron-style tensor parallelism over a ("data", "model") mesh.

The reference has no tensor-parallel path (it scales by DDP replicas only,
run.py:106-146); this module is the TPU-native extension: attention and MLP
weights are sharded over the `model` mesh axis and XLA/GSPMD inserts the
ICI collectives (all-reduce after row-parallel matmuls) automatically.

Sharding rules (classic Megatron split, applied by parameter *path* so the
same rule covers params, Adam mu/nu, and accumulated grads — any pytree whose
leaf paths end with the module/param names of the model):

- column-parallel (output dim sharded, bias sharded):
    to_q / to_k / to_v   — packed [D, H*Hd] projections; sharding the packed
                           axis == sharding heads (H*Hd reshapes to [H, Hd]
                           and GSPMD propagates through the reshape)
    to_g / to_s          — gating projections, elementwise against the
                           head-sharded aggregate so they share its layout
    w_kr / w_vr / b_vr   — relative-position K/V projections
    ff_0                 — MLP up-projection [D, 4D]
- row-parallel (input dim sharded, output replicated -> psum):
    to_out               — attention output projection [H*Hd, D]
    ff_1                 — MLP down-projection [4D, D]
- everything else (layernorms, embeddings, Fourier MLPs, heads) replicated.

A dimension is only sharded when divisible by the `model` axis size; with
hidden 128 / 8 heads x 16, tp in {2, 4, 8} shards cleanly.
"""

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module name -> which kernel axis is sharded
_COL_MODULES = frozenset({"to_q", "to_k", "to_v", "to_g", "to_s", "ff_0"})
_ROW_MODULES = frozenset({"to_out", "ff_1"})
_COL_PARAMS = frozenset({"w_kr", "w_vr"})  # direct params on the attn module
_COL_BIASES = frozenset({"b_vr"})


def make_mesh(devices=None, data: int = 0, model: int = 1) -> Mesh:
    """Build a ("data", "model") mesh. data=0 means "all remaining"."""
    devices = np.asarray(jax.devices() if devices is None else devices)
    model = max(1, model)
    if devices.size < model:
        raise ValueError(f"model={model} needs >= {model} devices, "
                         f"have {devices.size}")
    if data <= 0:
        data = devices.size // model
        if data * model < devices.size:
            import warnings
            warnings.warn(f"mesh {data}x{model} uses only {data * model} of "
                          f"{devices.size} devices (size not divisible by "
                          f"model={model})")
    n = data * model
    assert n <= devices.size, f"mesh {data}x{model} needs {n} devices"
    return Mesh(devices[:n].reshape(data, model), axis_names=("data", "model"))


def _path_names(path) -> list:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
    return names


def param_spec_for_path(path, leaf, tp: int, axis: str = "model") -> P:
    """PartitionSpec for one leaf, keyed on the last two path components.

    Works on any params-shaped pytree (raw params, optimizer moments,
    MultiSteps accumulators) because only the trailing names matter.
    """
    if tp <= 1 or leaf.ndim == 0:
        return P()
    names = _path_names(path)
    if not names:
        return P()
    pname = names[-1]
    mod = names[-2] if len(names) >= 2 else ""
    if pname in _COL_PARAMS and leaf.ndim == 2 and leaf.shape[1] % tp == 0:
        return P(None, axis)
    if pname in _COL_BIASES and leaf.shape[-1] % tp == 0:
        return P(axis)
    if mod in _COL_MODULES:
        if pname == "kernel" and leaf.shape[-1] % tp == 0:
            return P(None, axis)
        if pname == "bias" and leaf.shape[-1] % tp == 0:
            return P(axis)
    if mod in _ROW_MODULES and pname == "kernel" and leaf.shape[0] % tp == 0:
        return P(axis, None)
    return P()


def tree_param_specs(tree: Any, tp: int, axis: str = "model") -> Any:
    """PartitionSpec pytree for a params(-shaped) pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: param_spec_for_path(path, leaf, tp, axis), tree)


def state_sharding_tree(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a full TrainState (params + opt_state + step).

    Adam moments / gradient accumulators mirror the params tree, so the same
    trailing-path rule shards them identically; scalars (step, count) and any
    unrecognized leaves come out replicated.
    """
    tp = int(mesh.shape.get("model", 1))
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_spec_for_path(path, leaf, tp)), state)
