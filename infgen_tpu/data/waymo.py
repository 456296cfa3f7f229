"""Waymo preprocessed-pkl loader -> fixed-shape Scenario.

Consumes the per-scenario pickles produced by the reference's offline
extraction (data_preprocess.py:802-841; agent schema :151-226, map schema
:226-425) so existing preprocessed WOMD datasets work unchanged. Host-side:
unpickling, train-agent scoring (WaymoTargetBuilder._score_trained_agents,
scalable_dataset.py:113-138), map tokenization, then padding.
"""

import json
import os
import pickle
from typing import Optional

import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.data.scenario import Scenario, build_scenario
from infgen_tpu.tokenizers.map_tokenizer import MapTokenizer, tokenize_map_polylines


def _to_numpy(x):
    if hasattr(x, "numpy"):
        return x.numpy()
    return np.asarray(x)


def score_trained_agents(position, valid, role, max_num: int = 32,
                         num_historical_steps: int = 11,
                         rng: Optional[np.random.Generator] = None):
    """Train-agent selection (scalable_dataset.py:113-138).

    Returns (valid, train_mask): perception clipped to 150 m of ego; train on
    role agents + up to `max_num` nearby agents with >=5 future valid steps.
    """
    rng = rng or np.random.default_rng(0)
    step_current = num_historical_steps - 1
    av_index = int(np.nonzero(role[:, 0])[0][0])
    distance = np.linalg.norm(position - position[av_index], axis=-1)
    valid = valid & (distance < 150)

    role_mask = role.any(-1)
    extra = (distance[:, step_current] < 100) & \
            (valid[:, step_current + 1:].sum(-1) >= 5)
    train_mask = extra | role_mask
    if train_mask.sum() > max_num:
        cand = np.nonzero(extra & ~role_mask)[0]
        sel = rng.permutation(cand)[: max_num - role_mask.sum()]
        train_mask = role_mask.copy()
        train_mask[sel] = True
    return valid, train_mask


def pkl_to_scenario(data: dict, cfg: Config, map_tokenizer: MapTokenizer,
                    scenario_id: int = 0, training: bool = True) -> Scenario:
    """Convert one reference-format pkl dict into a Scenario."""
    ag = data["agent"]
    position = _to_numpy(ag["position"]).astype(np.float32)
    valid = _to_numpy(ag["valid_mask"]).astype(bool)
    heading = _to_numpy(ag["heading"]).astype(np.float32)
    velocity = _to_numpy(ag["velocity"]).astype(np.float32)
    type_ = _to_numpy(ag["type"]).astype(np.int32)
    shape = _to_numpy(ag["shape"]).astype(np.float32)
    role = _to_numpy(ag.get("role", np.zeros((len(type_), 3), bool))).astype(bool)
    av_idx = int(ag.get("av_idx", ag.get("av_index", 0)))
    if not role[:, 0].any():
        role[av_idx, 0] = True

    if training:
        valid, train_mask = score_trained_agents(
            position, valid, role, cfg.max_num, cfg.num_historical_steps)
    else:
        train_mask = np.ones(len(type_), bool)

    # per-agent static shape: first step with nonzero shape (preprocess.py:520-522)
    nz = np.all(shape != 0, axis=-1)
    first_nz = np.argmax(nz, axis=1)
    static_shape = shape[np.arange(len(type_)), first_nz]

    agent_arrays = dict(
        valid=valid, position=position[..., :2], heading=heading,
        velocity=velocity[..., :2], shape=static_shape, type=type_,
        av_index=av_idx, train_mask=train_mask,
        # logged z for 3D GT metric kinematics (compute_metrics.py:560+)
        elevation=(position[..., 2] if position.shape[-1] > 2
                   else np.zeros_like(heading)),
    )

    # --- map: cached tokenization if the pkl carries it (our preprocess
    # writes "map_token"; see tokenize_pkl_map), else tokenize on the fly
    # like the reference's WaymoTargetBuilder (scalable_dataset.py:145)
    if "map_token" in data:
        map_arrays = {k: _to_numpy(v) for k, v in data["map_token"].items()}
    else:
        map_arrays = tokenize_pkl_map(data, map_tokenizer)

    return build_scenario(agent_arrays, map_arrays, cfg.max_agents,
                          cfg.max_map_tokens, scenario_id=scenario_id)


def tokenize_pkl_map(data: dict, map_tokenizer: MapTokenizer) -> dict:
    """Group pkl map points by (polygon, type), split into 5 m segments, and
    match against the map vocab. Factored out so offline preprocessing can
    cache the result in the pkl (round-1 review: per-access tokenization made
    real-WOMD training input-bound)."""
    pt2pl = _to_numpy(data[("map_point", "to", "map_polygon")]["edge_index"])
    pt_pos = _to_numpy(data["map_point"]["position"])[:, :2]
    pt_orient = _to_numpy(data["map_point"]["orientation"])
    pt_type = _to_numpy(data["map_point"]["type"]).astype(np.int32)
    pl_type = _to_numpy(data["map_polygon"]["type"]).astype(np.int32)
    pl_light = _to_numpy(data["map_polygon"].get(
        "light_type", np.zeros(pl_type.shape[0]))).astype(np.int32)

    polylines = []
    for pl in np.unique(pt2pl[1]):
        idx = pt2pl[0, pt2pl[1] == pl]
        for tv in np.unique(pt_type[idx]):
            if tv == 13:  # skip crosswalk-boundary type (preprocess.py:722-723)
                continue
            sel = idx[pt_type[idx] == tv]
            if len(sel) <= 2:
                continue
            polylines.append(dict(
                points=pt_pos[sel], headings=pt_orient[sel], pt_type=int(tv),
                side=0, pl_type=int(pl_type[pl]), pl_id=int(pl),
                light=int(pl_light[pl]),
            ))

    map_arrays = tokenize_map_polylines(polylines)
    map_arrays["token_idx"] = np.asarray(map_tokenizer.match(
        map_arrays["traj_pos"], map_arrays["traj_theta"]))
    map_arrays["position"] = map_arrays["traj_pos"][:, 0]
    map_arrays["orientation"] = map_arrays["traj_theta"]
    return map_arrays


class WaymoDataset:
    """pkl-per-scenario dataset with meta filtering (scalable_dataset.py:17-97).

    Filters scenarios by 8 <= num_agents < buffer_size using meta_infos.json
    when available.
    """

    def __init__(self, raw_dir: str, cfg: Config, training: bool = True):
        self.raw_dir = raw_dir
        self.cfg = cfg
        self.training = training
        self.map_tokenizer = MapTokenizer()

        files = sorted(f for f in os.listdir(raw_dir) if f.endswith(".pkl"))
        meta_path = os.path.join(raw_dir, "meta_infos.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            files = [f for f in files
                     if 8 <= meta.get(f.split(".")[0], {}).get(
                         "num_agents", 8) < cfg.buffer_size]
        self.files = files

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> Scenario:
        with open(os.path.join(self.raw_dir, self.files[i]), "rb") as f:
            data = pickle.load(f)
        return pkl_to_scenario(data, self.cfg, self.map_tokenizer,
                               scenario_id=i, training=self.training)
