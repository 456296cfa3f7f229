"""Offline WOSAC metric CLI: dump GT features, aggregate, score rollouts.

Port of the reference's offline flow (compute_metrics.py:1537-1872):
  --dump_log       per-scenario ground-truth feature extraction -> .npz
  --aggregate_log  concatenate into total_features.npz (the log histograms)
  --compute_metric score dumped rollouts against the aggregated histograms

Rollout dumps are produced by `python -m infgen_tpu.cli rollout --dump_rollouts`.
Jobs are idempotent: existing output files are skipped (reference
data_preprocess.py:813 / model/infgen.py:593-601 resume semantics).
"""

import argparse
import glob
import json
import os
from typing import List

import jax
import numpy as np

from infgen_tpu.config import Config, load_config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.metrics.features import MetricFeatures, compute_metric_features
from infgen_tpu.metrics.wosac import (
    WosacConfig,
    aggregate_scenario_metrics,
    compute_scenario_metrics,
    make_log_distributions,
)

_FIELDS = MetricFeatures._fields


def _save_features(path: str, f: MetricFeatures):
    np.savez_compressed(path, **{k: np.asarray(getattr(f, k)) for k in _FIELDS})


def _load_features(path: str) -> MetricFeatures:
    data = np.load(path)
    return MetricFeatures(**{k: data[k] for k in _FIELDS})


def dump_log_features(dataset, cfg: Config, out_dir: str):
    """Per-scenario GT features (reference _dump_log_metric_features:1537)."""
    from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
    from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer

    from infgen_tpu.metrics.map_distance import packed_road_edges

    os.makedirs(out_dir, exist_ok=True)
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    build = jax.jit(lambda s, r: build_model_inputs(cfg, mt, attr, s, r))
    feats = jax.jit(lambda scen, inputs, re, rc: compute_metric_features(
        scen.agents.position[..., :2], scen.agents.heading, scen.agents.valid,
        scen.agents.shape[:, 0], scen.agents.shape[:, 1],
        scen.agents.slot_mask, scen.agents.av_index,
        inputs.tokens.token_pos, inputs.tokens.state_idx, re, rc,
        traj_z=scen.agents.elevation))

    for i in range(len(dataset)):
        out = os.path.join(out_dir, f"log_features_{i:06d}.npz")
        if os.path.exists(out):
            continue
        scen = dataset[i]
        inputs = build(scen, jax.random.PRNGKey(0))
        road_edges, road_cyclic = packed_road_edges(scen.map)
        _save_features(out, feats(scen, inputs, road_edges, road_cyclic))
    return out_dir


def aggregate_log_features(log_dir: str, out_path: str = None) -> MetricFeatures:
    """Concatenate per-scenario dumps (aggregate_log_metric_features:1675)."""
    files = sorted(glob.glob(os.path.join(log_dir, "log_features_*.npz")))
    if not files:
        raise FileNotFoundError(f"no log feature dumps in {log_dir}")
    parts = [_load_features(f) for f in files]
    agg = MetricFeatures(*[
        np.concatenate([np.asarray(getattr(p, k)) for p in parts], axis=0)
        for k in _FIELDS
    ])
    out_path = out_path or os.path.join(log_dir, "total_features.npz")
    _save_features(out_path, agg)
    return agg


def compute_metrics_offline(rollout_dir: str, total_features_path: str,
                            out_path: str = None) -> List[dict]:
    """Score dumped rollouts (batch_compute_metrics:1754)."""
    wcfg = WosacConfig()
    log_feats = _load_features(total_features_path)
    log_dist = make_log_distributions(wcfg, log_feats)

    # jit per distinct (shape, road-edge presence) signature; log_dist rides
    # as a traced argument (closure-captured arrays cost ~40 ms/call per
    # scored field on the axon relay, and eager scoring there is seconds/op)
    score_fn = jax.jit(lambda ld, f: compute_scenario_metrics(wcfg, ld, f))

    results = []
    for f in sorted(glob.glob(os.path.join(rollout_dir, "rollout_*.npz"))):
        d = np.load(f)
        road_edges = d["road_edges"] if "road_edges" in d else None
        road_cyclic = d["road_cyclic"] if "road_cyclic" in d else None
        if road_edges is not None and road_edges.shape[0] == 0:
            road_edges = road_cyclic = None
        sim = compute_metric_features(
            d["pred_traj"], d["pred_head"], d["pred_valid"].astype(bool),
            d["length"], d["width"], d["slot_active"].astype(bool),
            int(d["av_index"]), d["token_pos"], d["token_state"],
            road_edges, road_cyclic)
        m = score_fn(log_dist, sim)
        m = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
             for k, v in m.items()}
        m["file"] = os.path.basename(f)
        results.append(m)

    out_path = out_path or os.path.join(rollout_dir, "wosac_metrics.json")
    # scenario-set aggregation + bucketed summary (LongMetric.compute schema,
    # compute_metrics.py:1403-1453; parity: tests/test_wosac_aggregate.py)
    summary = aggregate_scenario_metrics(wcfg, results) if results else {}
    with open(out_path, "w") as fo:
        json.dump({"summary": summary, "scenarios": results}, fo, indent=2)
    print(json.dumps(summary, indent=2))
    return results


def save_rollout_dump(path: str, out: dict, road_edges=None, road_cyclic=None):
    """Persist one rollout's arrays for offline scoring. Road-edge polylines
    ride along so offline scoring can emit the map bucket without the map."""
    np.savez_compressed(
        path,
        pred_traj=np.asarray(out["pred_traj"]),
        pred_head=np.asarray(out["pred_head"]),
        pred_valid=np.asarray(out["pred_valid"]),
        length=np.asarray(out["eval_shape"][:, 0]),
        width=np.asarray(out["eval_shape"][:, 1]),
        slot_active=np.asarray(out["slot_active"]),
        av_index=int(out["av_index"]),
        token_pos=np.asarray(out["pos_a"]),
        token_state=np.asarray(out["next_state_idx"]),
        road_edges=(np.asarray(road_edges) if road_edges is not None
                    else np.zeros((0, 2, 4), np.float32)),
        road_cyclic=(np.asarray(road_cyclic) if road_cyclic is not None
                     else np.zeros((0,), bool)),
    )


def main(argv=None):
    p = argparse.ArgumentParser("infgen_tpu.metrics.offline")
    p.add_argument("--dump_log", action="store_true")
    p.add_argument("--aggregate_log", action="store_true")
    p.add_argument("--compute_metric", action="store_true")
    p.add_argument("--config", default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--log_dir", default="runs/log_features")
    p.add_argument("--rollout_dir", default="runs/default")
    p.add_argument("--num_scenarios", type=int, default=16)
    p.add_argument("--cpu", action="store_true", help="force CPU backend "
                   "(the env JAX_PLATFORMS=cpu is overridden in some "
                   "session setups; this uses jax.config)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    from infgen_tpu.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    cfg = load_config(args.config) if args.config else Config()

    if args.dump_log:
        if args.synthetic or not args.data_dir:
            from infgen_tpu.train.loop import SyntheticDataset
            dataset = SyntheticDataset(cfg, size=args.num_scenarios)
        else:
            from infgen_tpu.data.waymo import WaymoDataset
            dataset = WaymoDataset(args.data_dir, cfg, training=False)
        dump_log_features(dataset, cfg, args.log_dir)
    if args.aggregate_log:
        aggregate_log_features(args.log_dir)
    if args.compute_metric:
        compute_metrics_offline(
            args.rollout_dir, os.path.join(args.log_dir, "total_features.npz"))


if __name__ == "__main__":
    main()
