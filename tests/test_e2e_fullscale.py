"""Full-scale pipeline rehearsal from raw bytes (VERDICT r3 item 6).

Same chain as tests/test_e2e_pipeline.py (tfrecord bytes -> preprocess ->
train -> rollout+WOSAC -> offline metrics) but at FLAGSHIP DATA SCALE:
>= 128 agent tracks with invalid gaps and mixed/unsupported types, a
multi-polyline map dense enough to saturate 1024 map tokens, and traffic
lights on many lanes — the regime first real-data contact will hit
(reference field coverage: /root/reference/data_preprocess.py:555-771).
The model itself stays tiny (configs/fullscale_smoke.yaml): the rehearsal
exercises data shapes and the pipeline, not model compute.
"""

import json
import os
import pickle

import numpy as np

from tests.test_e2e_pipeline import _write_tfrecord
from tests.test_preprocess import (
    _double,
    _map_points,
    _msg,
    _track,
    _vint,
)

# 126 tracks -> 123 usable after unsupported-type drops: just under the
# dataset meta filter's `num_agents < buffer_size(=128)` cut (the reference
# excludes saturated scenes the same way, scalable_dataset.py meta filter)
N_TRACKS = 126
T = 91


def _fullscale_scenario_bytes(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(T) * 0.1

    tracks = b""
    for a in range(N_TRACKS):
        if a == 0:
            x0, y0, speed, heading, otype = 0.0, 0.0, 5.0, 0.0, 1  # ego
        else:
            x0, y0 = rng.uniform(-80, 80, 2)
            speed = rng.uniform(0.5, 9.0)
            heading = rng.uniform(-np.pi, np.pi)
            # mixed types; every 33rd an unsupported "other" (must drop)
            otype = 4 if a % 33 == 32 else int(rng.choice(
                [1, 1, 1, 2, 3], p=[0.3, 0.3, 0.2, 0.1, 0.1]))
        xs = x0 + speed * t * np.cos(heading)
        ys = y0 + speed * t * np.sin(heading)
        valid = None
        if a > 0 and a % 3 == 0:       # late entry
            valid = [i >= int(rng.integers(5, 40)) for i in range(T)]
        elif a > 0 and a % 7 == 1:     # mid-track gap (tests interpolation)
            g0 = int(rng.integers(20, 60))
            valid = [not (g0 <= i < g0 + 8) for i in range(T)]
        elif a > 0 and a % 11 == 2:    # early exit
            valid = [i < int(rng.integers(30, 80)) for i in range(T)]
        tracks += _msg(2, _track(1000 + a, otype, xs, ys,
                                 np.full(T, heading), valid))

    # dense multi-polyline map: enough segments to SATURATE 1024 map tokens
    map_features = b""
    fid = 0
    for lane_i in range(24):           # 24 lanes x 120 m
        y = -90 + lane_i * 8.0
        pts = [(float(x), y) for x in range(-120, 120, 2)]
        lane = _msg(3, _double(1, 30.0) + _vint(2, 1) + _map_points(8, pts))
        map_features += _msg(8, _vint(1, 7000 + fid) + lane)
        fid += 1
    for edge_i in range(8):            # road edges
        x = -120 + edge_i * 34.0
        pts = [(x, float(y)) for y in range(-120, 120, 2)]
        edge = _msg(5, _vint(1, 1) + _map_points(2, pts))
        map_features += _msg(8, _vint(1, 7000 + fid) + edge)
        fid += 1
    for line_i in range(4):            # road lines
        y = -86 + line_i * 48.0
        pts = [(float(x), y) for x in range(-120, 120, 4)]
        line = _msg(4, _vint(1, 1) + _map_points(2, pts))
        map_features += _msg(8, _vint(1, 7000 + fid) + line)
        fid += 1
    for cw_i in range(2):              # crosswalk polygons
        cx = -30.0 + cw_i * 60.0
        pts = [(cx, -4.0), (cx + 6.0, -4.0), (cx + 6.0, 4.0), (cx, 4.0)]
        cw = _msg(8, _map_points(2, pts))
        map_features += _msg(8, _vint(1, 7000 + fid) + cw)
        fid += 1

    # traffic lights: 6 lanes signalled, one DynamicMapState per history step
    light_states = b"".join(
        _msg(1, _vint(1, 7000 + i) + _vint(2, 3 + (i % 3))) for i in range(6))
    lights = _msg(7, light_states) * 11

    sid = f"fullscale_{seed:03d}".encode()
    return (b"".join(_double(1, float(x)) for x in t[:5]) +
            tracks + map_features + lights +
            _msg(5, sid) + _vint(6, 0) + _vint(10, 10) +
            _msg(11, _vint(1, 1)))


def test_fullscale_pipeline(tmp_path):
    raw_dir = tmp_path / "raw"
    pkl_dir = tmp_path / "processed"
    run_dir = tmp_path / "run"
    roll_dir = tmp_path / "rollouts"
    log_dir = tmp_path / "log_features"
    raw_dir.mkdir()

    _write_tfrecord(raw_dir / "train.tfrecord-00000",
                    [_fullscale_scenario_bytes(0)])

    # 1. preprocess: field coverage at scale
    from infgen_tpu.data.preprocess import main as preprocess_main
    preprocess_main(["--input_dir", str(raw_dir), "--output_dir",
                     str(pkl_dir), "--num_workers", "1"])
    pkls = sorted(p for p in os.listdir(pkl_dir) if p.endswith(".pkl"))
    assert len(pkls) == 1
    with open(pkl_dir / pkls[0], "rb") as f:
        d = pickle.load(f)
    n_tracks = d["agent"]["valid_mask"].shape[0]
    assert n_tracks >= 120, f"only {n_tracks} usable tracks survived"
    assert not d["agent"]["valid_mask"].all(), "invalid gaps were lost"
    assert "map_token" in d
    n_lit = (np.asarray(d["map_point"]["tl_statuses"]) > 0).sum() \
        if "tl_statuses" in d.get("map_point", {}) else None

    # 2. dataset item at flagship capacity: both axes saturated
    from infgen_tpu.config import load_config
    from infgen_tpu.data.waymo import WaymoDataset
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "fullscale_smoke.yaml")
    cfg = load_config(cfg_path)
    assert cfg.max_agents == 128 and cfg.max_map_tokens == 1024
    ds = WaymoDataset(str(pkl_dir), cfg)
    scen = ds[0]
    assert int(np.asarray(scen.agents.slot_mask).sum()) >= 120, \
        "agent slots not near capacity"
    assert int(np.asarray(scen.map.mask).sum()) == 1024, \
        "map tokens not saturated"
    assert (np.asarray(scen.map.light_type) > 0).any(), \
        "traffic-light states did not reach the model inputs"
    # several agent types present after scoring/selection
    types = np.asarray(scen.agents.type)[np.asarray(scen.agents.slot_mask)]
    assert len(np.unique(types)) >= 2

    # 3. two training steps at these shapes
    from infgen_tpu.cli import main as cli_main
    cli_main(["train", "--config", cfg_path, "--data_dir", str(pkl_dir),
              "--save_dir", str(run_dir), "--max_steps", "2"])
    # max_steps=2 < log_every, so no train-scalar rows land in the jsonl;
    # the terminal forced checkpoint + the finite open-loop val record are
    # the completion evidence
    assert os.path.isdir(run_dir / "ckpt")
    with open(run_dir / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    val_losses = [r["val/loss"] for r in rows if "val/loss" in r]
    assert val_losses and np.isfinite(val_losses[-1])

    # 4. closed-loop rollout + WOSAC at flagship data scale
    cli_main(["rollout", "--config", cfg_path, "--data_dir", str(pkl_dir),
              "--num_scenarios", "1", "--save_dir", str(roll_dir),
              "--ckpt_path", str(run_dir / "ckpt"), "--dump_rollouts"])
    with open(roll_dir / "rollout_metrics.json") as f:
        m = json.load(f)
    assert np.isfinite(m["scenarios"][0]["metametric"])
    dump = np.load(roll_dir / "rollout_000000.npz")
    assert dump["pred_traj"].shape[0] == 128

    # 5. offline metric chain on the same artifacts
    from infgen_tpu.metrics.offline import main as offline_main
    offline_main(["--dump_log", "--aggregate_log", "--config", cfg_path,
                  "--data_dir", str(pkl_dir), "--log_dir", str(log_dir)])
    offline_main(["--compute_metric", "--log_dir", str(log_dir),
                  "--rollout_dir", str(roll_dir)])
    with open(roll_dir / "wosac_metrics.json") as f:
        w = json.load(f)
    assert np.isfinite(w["summary"]["wosac/realism_meta_metric"])
    assert w["summary"]["wosac/scenario_counter"] == 1
