"""Synthetic WOMD-like scenario generator.

Used by tests and benchmarks when no Waymo data is on disk: a small road
network of straight/curved lanes with agents driving along them at constant
speed, some entering/exiting mid-log, mirroring the statistics the model
consumes (91-step 10 Hz tracks, 8-128 agents, pt-token map).
"""

import math
from typing import Optional

import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.data.scenario import Scenario, build_scenario
from infgen_tpu.tokenizers.map_tokenizer import MapTokenizer, tokenize_map_polylines


def _lane(points_start, heading, length, curvature=0.0, step=1.0):
    """Polyline points for a (possibly arced) lane."""
    n = int(length / step)
    pts = [np.asarray(points_start, np.float64)]
    h = heading
    headings = [h]
    for _ in range(n):
        pts.append(pts[-1] + step * np.array([math.cos(h), math.sin(h)]))
        h += curvature * step
        headings.append(h)
    return np.stack(pts), np.asarray(headings)


def make_synthetic_scenario(cfg: Config, seed: int = 0, num_agents: Optional[int] = None,
                            map_tokenizer: Optional[MapTokenizer] = None,
                            t10: int = 91) -> Scenario:
    rng = np.random.default_rng(seed)
    num_agents = num_agents or int(rng.integers(8, min(cfg.max_agents, 48)))

    # --- road network: grid of lanes + two arcs around the origin ---
    polylines = []
    pl_id = 0
    for off in (-8.0, -4.0, 0.0, 4.0, 8.0):
        for heading, start in ((0.0, (-150.0, off)), (math.pi / 2, (off, -150.0))):
            pts, hd = _lane(start, heading, 300.0)
            polylines.append(dict(points=pts, headings=hd, pt_type=1, side=2,
                                  pl_type=0, pl_id=pl_id, light=0))
            pl_id += 1
    for r, c in ((40.0, 1.0 / 40.0), (70.0, -1.0 / 70.0)):
        pts, hd = _lane((r, 0.0), math.pi / 2, 2 * math.pi * r * 0.75, curvature=c)
        polylines.append(dict(points=pts, headings=hd, pt_type=1, side=2,
                              pl_type=0, pl_id=pl_id, light=0))
        pl_id += 1
    # road edges
    for off in (-12.0, 12.0):
        pts, hd = _lane((-150.0, off), 0.0, 300.0)
        polylines.append(dict(points=pts, headings=hd, pt_type=15, side=0,
                              pl_type=3, pl_id=pl_id, light=0))
        pl_id += 1

    map_arrays = tokenize_map_polylines(polylines)
    mt = map_tokenizer or MapTokenizer()
    map_arrays["token_idx"] = np.asarray(
        mt.match(map_arrays["traj_pos"], map_arrays["traj_theta"]))
    map_arrays["position"] = map_arrays["traj_pos"][:, 0]
    map_arrays["orientation"] = map_arrays["traj_theta"]

    # --- agents on lanes ---
    A, T = num_agents, t10
    lane_pool = polylines[: pl_id - 2]
    valid = np.zeros((A, T), bool)
    pos = np.zeros((A, T, 2), np.float32)
    heading = np.zeros((A, T), np.float32)
    vel = np.zeros((A, T, 2), np.float32)
    types = np.zeros(A, np.int32)
    shapes = np.zeros((A, 3), np.float32)

    for a in range(A):
        lane = lane_pool[int(rng.integers(len(lane_pool)))]
        pts, hds = lane["points"], lane["headings"]
        # arc-length parametrization
        seg = np.linalg.norm(np.diff(pts, axis=0), axis=-1)
        s = np.concatenate([[0.0], np.cumsum(seg)])
        typ = int(rng.choice([0, 0, 0, 1, 2], p=[0.6, 0.1, 0.1, 0.1, 0.1]))
        types[a] = typ
        speed = {0: rng.uniform(3, 14), 1: rng.uniform(0.5, 1.8), 2: rng.uniform(2, 6)}[typ]
        shapes[a] = {0: (4.8, 2.0, 1.8), 1: (0.9, 0.9, 1.8), 2: (1.9, 0.7, 1.6)}[typ]
        s0 = rng.uniform(0, max(s[-1] - speed * T * 0.1, 1.0))
        t_arr = np.arange(T) * 0.1
        s_t = np.clip(s0 + speed * t_arr, 0, s[-1])
        pos[a, :, 0] = np.interp(s_t, s, pts[:, 0])
        pos[a, :, 1] = np.interp(s_t, s, pts[:, 1])
        heading[a] = np.interp(s_t, s, np.unwrap(hds))
        vel[a, :, 0] = speed * np.cos(heading[a])
        vel[a, :, 1] = speed * np.sin(heading[a])
        # lateral jitter
        normal = np.stack([-np.sin(heading[a]), np.cos(heading[a])], -1)
        pos[a] += normal * rng.uniform(-0.5, 0.5)

        valid[a] = True
        r = rng.uniform()
        if a > 0 and r < 0.25:       # late entry
            valid[a, : int(rng.integers(12, T - 15))] = False
        elif a > 0 and r < 0.40:     # early exit
            valid[a, int(rng.integers(20, T - 5)):] = False

    agent_arrays = dict(valid=valid, position=pos, heading=heading, velocity=vel,
                        shape=shapes, type=types, av_index=0,
                        train_mask=np.ones(A, bool))
    return build_scenario(agent_arrays, map_arrays, cfg.max_agents,
                          cfg.max_map_tokens, scenario_id=seed)
