"""Fixed-shape scenario containers (JAX pytrees).

The reference represents scenarios as torch_geometric HeteroData with dynamic
node counts; on TPU everything is padded to static shapes:
  A  = cfg.max_agents      agent slots (reference buffer_size=128)
  T10= raw 10 Hz steps     (91 for WOMD 9.1 s logs)
  P  = cfg.max_map_tokens  map ("pt") tokens per scenario

Agent insertion during rollout activates padded slots instead of growing
tensors (reference grows: agent_decoder.py:1920-1999).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class AgentData(NamedTuple):
    """Raw (pre-tokenization) agent tracks, padded to A slots."""

    valid: jnp.ndarray      # [A, T10] bool
    position: jnp.ndarray   # [A, T10, 2] f32 (x, y)
    # logged elevation, zeros when the source has none: the reference's GT
    # metric kinematics are 3D (trajectory_features.py:32-47, fed from
    # logged z at compute_metrics.py:560+) while simulated z is hardcoded 0
    # (agent_decoder.py:2338) — the model itself stays planar
    elevation: jnp.ndarray  # [A, T10] f32 (z)
    heading: jnp.ndarray    # [A, T10] f32
    velocity: jnp.ndarray   # [A, T10, 2] f32
    shape: jnp.ndarray      # [A, 3] f32 (length, width, height) per agent
    type: jnp.ndarray       # [A] int32: 0 veh / 1 ped / 2 cyc
    slot_mask: jnp.ndarray  # [A] bool: slot holds a real agent
    train_mask: jnp.ndarray  # [A] bool: agent scored for training
    av_index: jnp.ndarray   # [] int32 ego slot


class MapData(NamedTuple):
    """Tokenized map: one entry per 5 m polyline segment ("pt token")."""

    position: jnp.ndarray    # [P, 2] f32 segment start
    orientation: jnp.ndarray  # [P] f32 segment start heading
    token_idx: jnp.ndarray   # [P] int32 matched map-vocab id
    pt_type: jnp.ndarray     # [P] int32 point type
    pt_side: jnp.ndarray     # [P] int32 side (0 left / 1 right / 2 center)
    pl_type: jnp.ndarray     # [P] int32 parent polygon type
    light_type: jnp.ndarray  # [P] int32 traffic-light state of parent polygon
    chain_id: jnp.ndarray    # [P] int32 id of the (polygon, side) chain
    chain_pos: jnp.ndarray   # [P] int32 position along the chain
    mask: jnp.ndarray        # [P] bool valid token


class Scenario(NamedTuple):
    agents: AgentData
    map: MapData
    scenario_id: jnp.ndarray  # [] int32


def pad_axis(x: np.ndarray, size: int, axis: int = 0, fill=0):
    """Pad (or truncate) `x` along `axis` to `size` with `fill`."""
    x = np.asarray(x)
    n = x.shape[axis]
    if n == size:
        return x
    if n > size:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, size)
        return x[tuple(sl)]
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, size - n)
    return np.pad(x, pad_width, constant_values=fill)


def build_scenario(agent_arrays: dict, map_arrays: dict, max_agents: int,
                   max_map_tokens: int, scenario_id: int = 0) -> Scenario:
    """Pad host-side numpy dicts into a fixed-shape Scenario."""
    A = max_agents
    P = max_map_tokens
    n_agent = agent_arrays["valid"].shape[0]
    n_pt = map_arrays["position"].shape[0]

    # host-side numpy leaves: eager jnp.asarray would issue one transfer per
    # field on remote TPU backends; jit inputs transfer on use instead
    agents = AgentData(
        valid=pad_axis(agent_arrays["valid"], A).astype(bool),
        position=pad_axis(agent_arrays["position"], A).astype(np.float32),
        elevation=pad_axis(agent_arrays.get(
            "elevation",
            np.zeros(agent_arrays["valid"].shape, np.float32)), A
        ).astype(np.float32),
        heading=pad_axis(agent_arrays["heading"], A).astype(np.float32),
        velocity=pad_axis(agent_arrays["velocity"], A).astype(np.float32),
        shape=pad_axis(agent_arrays["shape"], A).astype(np.float32),
        type=pad_axis(agent_arrays["type"], A).astype(np.int32),
        slot_mask=np.arange(A) < n_agent,
        train_mask=pad_axis(agent_arrays.get(
            "train_mask", np.ones(n_agent, bool)), A).astype(bool),
        av_index=np.asarray(agent_arrays["av_index"], np.int32),
    )
    maps = MapData(
        position=pad_axis(map_arrays["position"], P).astype(np.float32),
        orientation=pad_axis(map_arrays["orientation"], P).astype(np.float32),
        token_idx=pad_axis(map_arrays["token_idx"], P).astype(np.int32),
        pt_type=pad_axis(map_arrays["pt_type"], P).astype(np.int32),
        pt_side=pad_axis(map_arrays["pt_side"], P).astype(np.int32),
        pl_type=pad_axis(map_arrays["pl_type"], P).astype(np.int32),
        light_type=pad_axis(map_arrays["light_type"], P).astype(np.int32),
        chain_id=pad_axis(map_arrays["chain_id"], P, fill=-1).astype(np.int32),
        chain_pos=pad_axis(map_arrays["chain_pos"], P, fill=-1).astype(np.int32),
        mask=np.arange(P) < n_pt,
    )
    return Scenario(agents=agents, map=maps,
                    scenario_id=np.asarray(scenario_id, np.int32))
