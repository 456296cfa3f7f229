"""End-to-end product-path integration test.

Drives the ENTIRE reference workflow on synthetic WOMD protos:
tfrecord -> offline preprocessing (pkls + meta + cached map tokens) ->
WaymoDataset -> training (checkpointing) -> closed-loop rollout CLI with
WOSAC scoring + dumps -> offline metric CLI (dump_log / aggregate /
compute_metric). Mirrors the reference's scripts/data_preprocess.sh ->
run_train.sh -> run_eval.sh -> compute_metrics.sh chain.
"""

import json
import os
import struct

import numpy as np

from tests.test_preprocess import (
    _double,
    _map_points,
    _msg,
    _track,
    _vint,
)


def _scenario_bytes(seed: int, n_agents: int = 9, T: int = 91) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(T) * 0.1
    tracks = b""
    for a in range(n_agents):
        if a == 0:
            x0, y0, speed, heading = 0.0, 0.0, 5.0, 0.0  # ego
        else:
            x0, y0 = rng.uniform(-25, 25, 2)
            speed = rng.uniform(2.0, 8.0)
            heading = rng.uniform(-np.pi, np.pi)
        xs = x0 + speed * t * np.cos(heading)
        ys = y0 + speed * t * np.sin(heading)
        tracks += _msg(2, _track(100 + a, 1, xs, ys, np.full(T, heading)))

    lane_pts = [(float(x), 0.0) for x in range(-40, 120, 2)]
    lane = _msg(3, _double(1, 30.0) + _vint(2, 1) + _map_points(8, lane_pts))
    edge_pts = [(float(x), 30.0) for x in range(120, -40, -2)]
    edge = _msg(5, _vint(1, 1) + _map_points(2, edge_pts))
    edge2_pts = [(float(x), -30.0) for x in range(-40, 120, 2)]
    edge2 = _msg(5, _vint(1, 1) + _map_points(2, edge2_pts))
    map_features = (_msg(8, _vint(1, 700) + lane) +
                    _msg(8, _vint(1, 701) + edge) +
                    _msg(8, _vint(1, 702) + edge2))

    light = _msg(7, _msg(1, _vint(1, 700) + _vint(2, 4)))
    sid = f"e2e_scene_{seed:03d}".encode()
    return (b"".join(_double(1, float(x)) for x in t[:5]) +
            tracks + map_features + light * 11 +
            _msg(5, sid) + _vint(6, 0) + _vint(10, 10) +
            _msg(11, _vint(1, 1)))


def _write_tfrecord(path, payloads):
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)) + b"\0" * 4 + p + b"\0" * 4)


def test_full_pipeline(tmp_path):
    raw_dir = tmp_path / "raw"
    pkl_dir = tmp_path / "processed"
    run_dir = tmp_path / "run"
    roll_dir = tmp_path / "rollouts"
    log_dir = tmp_path / "log_features"
    raw_dir.mkdir()

    # 1. raw tfrecords (2 shards x 2 scenarios)
    _write_tfrecord(raw_dir / "train.tfrecord-00000",
                    [_scenario_bytes(0), _scenario_bytes(1)])
    _write_tfrecord(raw_dir / "train.tfrecord-00001",
                    [_scenario_bytes(2), _scenario_bytes(3)])

    # 2. offline preprocessing
    from infgen_tpu.data.preprocess import main as preprocess_main
    preprocess_main(["--input_dir", str(raw_dir), "--output_dir",
                     str(pkl_dir), "--num_workers", "1"])
    pkls = sorted(p for p in os.listdir(pkl_dir) if p.endswith(".pkl"))
    assert len(pkls) == 4, pkls
    assert os.path.exists(pkl_dir / "meta_infos.json")
    import pickle
    with open(pkl_dir / pkls[0], "rb") as f:
        d = pickle.load(f)
    assert "map_token" in d  # offline map-token cache present

    # 3. training on the preprocessed pkls (2 steps, tiny config)
    from infgen_tpu.cli import main as cli_main
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "tiny_smoke.yaml")
    cli_main(["train", "--config", cfg_path, "--data_dir", str(pkl_dir),
              "--save_dir", str(run_dir), "--max_steps", "2"])
    assert os.path.isdir(run_dir / "ckpt")
    assert os.path.exists(run_dir / "metrics.jsonl")

    # 4. closed-loop rollout CLI: WOSAC scoring + validation metrics + dumps,
    #    restoring the checkpoint written by (3)
    cli_main(["rollout", "--config", cfg_path, "--data_dir", str(pkl_dir),
              "--num_scenarios", "2", "--save_dir", str(roll_dir),
              "--ckpt_path", str(run_dir / "ckpt"), "--dump_rollouts"])
    with open(roll_dir / "rollout_metrics.json") as f:
        m = json.load(f)
    assert len(m["scenarios"]) == 2
    for sm in m["scenarios"]:
        assert np.isfinite(sm["metametric"])
        assert "simulated_offroad_rate" in sm
    assert "min_ade" in m["val_metrics"]
    dump = np.load(roll_dir / "rollout_000000.npz")
    assert dump["road_edges"].shape[0] > 0  # road edges rode along

    # 5. offline metric CLI chain on the same artifacts
    from infgen_tpu.metrics.offline import main as offline_main
    offline_main(["--dump_log", "--aggregate_log", "--config", cfg_path,
                  "--data_dir", str(pkl_dir), "--log_dir", str(log_dir)])
    assert os.path.exists(log_dir / "total_features.npz")
    offline_main(["--compute_metric", "--log_dir", str(log_dir),
                  "--rollout_dir", str(roll_dir)])
    with open(roll_dir / "wosac_metrics.json") as f:
        w = json.load(f)
    # reference LongMetric.compute output schema (compute_metrics.py:1455+):
    # aggregated metametric, bucket rollups, per-likelihood means
    assert np.isfinite(w["summary"]["wosac/realism_meta_metric"])
    assert "wosac/kinematic_metrics" in w["summary"]
    assert "wosac/placement_based_metrics" in w["summary"]
    assert "wosac_likelihood/simulated_offroad_rate" in w["summary"]
    assert w["summary"]["wosac/scenario_counter"] == 2
