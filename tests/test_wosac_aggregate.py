"""Scenario-set WOSAC aggregation parity vs the reference LongMetric.

Feeds an identical pinned per-scenario metric set to the reference
LongMetric.update/compute (compute_metrics.py:1309-1453, imported with the
real protobuf bindings and its textproto config) and to the repo's
aggregate_scenario_metrics, and compares every shared output: scalar
likelihood means (incl. the valid-count-weighted distance placement /
removement divisors), the bucketed summary (kinematic / interactive /
map_based / placement_based), and the per-window wosac_long curves reduced
with the reference's (0, 1]-validity mean.
"""

import sys
import types

import numpy as np
import pytest
import torch

from infgen_tpu.metrics.wosac import WosacConfig, aggregate_scenario_metrics
from tests import pyg_stubs
from tests.ref_oracle import import_reference


def _import_ref_compute_metrics():
    import_reference()
    pyg_stubs.install()
    if "torchmetrics" not in sys.modules:
        class Metric:
            def __init__(self):
                pass

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

        tm = types.ModuleType("torchmetrics")
        tm.Metric = Metric
        sys.modules["torchmetrics"] = tm
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningDataModule = object
        pl.LightningModule = object
        sys.modules["pytorch_lightning"] = pl
    if "waymo_open_dataset" not in sys.modules:
        wod = types.ModuleType("waymo_open_dataset")
        utils = types.ModuleType("waymo_open_dataset.utils")
        sim_agents = types.ModuleType("waymo_open_dataset.utils.sim_agents")
        sim_agents.submission_specs = types.SimpleNamespace()
        utils.sim_agents = sim_agents
        wod.utils = utils
        sys.modules["waymo_open_dataset"] = wod
        sys.modules["waymo_open_dataset.utils"] = utils
        sys.modules["waymo_open_dataset.utils.sim_agents"] = sim_agents
    from infgen.metrics import compute_metrics as cm
    return cm


FIELDS = WosacConfig().fields()


def _pinned_metrics(rng, S=7, W=13):
    """Pinned per-scenario values: likelihoods in (0,1], several exact zeros
    in the distance placement/removement scalars (exercises the valid-count
    divisors) and in the long curves (exercises _reduce_mean validity)."""
    per = []
    for s in range(S):
        m = {f"{f}_likelihood": float(rng.uniform(0.05, 1.0)) for f in FIELDS}
        if s % 2 == 0:
            m["distance_placement_likelihood"] = 0.0
        if s % 3 == 0:
            m["distance_removement_likelihood"] = 0.0
        m["metametric"] = float(rng.uniform(0.1, 0.9))
        m["simulated_collision_rate"] = float(rng.uniform(0.0, 1.0))
        for f in ["metametric"] + [f"{f}_likelihood" for f in FIELDS]:
            curve = rng.uniform(0.01, 1.0, W)
            curve[rng.uniform(size=W) < 0.25] = 0.0   # zeroed windows
            m[f"wosac_long/{f}"] = curve.tolist()
        per.append(m)
    return per


@pytest.fixture(scope="module")
def agg_pair():
    cm = _import_ref_compute_metrics()
    rng = np.random.default_rng(42)
    per = _pinned_metrics(rng)

    # ---- reference LongMetric, constructed without the log-features load ----
    lm = cm.LongMetric.__new__(cm.LongMetric)
    lm.prefix = "val"
    lm.metrics_config = cm.LongMetric.load_metrics_config(
        "/root/reference/infgen/metrics/metric_config.textproto")
    lm.field_names = [
        "metametric", "average_displacement_error",
        "min_average_displacement_error",
        "linear_speed_likelihood", "linear_acceleration_likelihood",
        "angular_speed_likelihood", "angular_acceleration_likelihood",
        "distance_to_nearest_object_likelihood",
        "collision_indication_likelihood", "time_to_collision_likelihood",
        "simulated_collision_rate", "num_placement_likelihood",
        "num_removement_likelihood", "distance_placement_likelihood",
        "distance_removement_likelihood"]
    for k in lm.field_names:
        setattr(lm, k, torch.tensor(0.0))
        setattr(lm, f"{k}_long", [])
    lm.scenario_counter = torch.tensor(0.0)
    lm.placement_valid_scenario_counter = torch.tensor(0.0)
    lm.removement_valid_scenario_counter = torch.tensor(0.0)

    metrics = []
    for m in per:
        proto = cm.long_metrics_pb2.SimAgentMetrics(
            scenario_id="x", metametric=m["metametric"],
            simulated_collision_rate=m["simulated_collision_rate"],
            **{f"{f}_likelihood": m[f"{f}_likelihood"] for f in FIELDS})
        long = {k: torch.tensor(m[f"wosac_long/{k}"],
                                dtype=torch.float64).reshape(1, -1)
                for k in ["metametric"] + [f"{f}_likelihood" for f in FIELDS]}
        metrics.append((proto, long))
    lm.update(metrics=metrics)
    ref = lm.compute()
    ref = {k[len("val/"):]: v for k, v in ref.items()}

    repo = aggregate_scenario_metrics(WosacConfig(), per)
    return repo, ref


def test_scalar_likelihood_means(agg_pair):
    """Per-field scalar means incl. the distance placement/removement
    valid-count divisors (compute_metrics.py:1408-1413)."""
    repo, ref = agg_pair
    for f in FIELDS:
        k = f"{f}_likelihood"
        assert repo[f"wosac_likelihood/{k}"] == pytest.approx(
            float(ref[f"wosac_likelihood/{k}"]), abs=1e-6), k
    assert repo["wosac_likelihood/metametric"] == pytest.approx(
        float(ref["wosac_likelihood/metametric"]), abs=1e-6)
    assert repo["wosac_likelihood/simulated_collision_rate"] == pytest.approx(
        float(ref["wosac_likelihood/simulated_collision_rate"]), abs=1e-6)


def test_bucketed_summary(agg_pair):
    """Bucket rollups match SimAgentsBucketedMetrics (:1455-1485)."""
    repo, ref = agg_pair
    for key in ("realism_meta_metric", "kinematic_metrics",
                "interactive_metrics", "map_based_metrics",
                "placement_based_metrics"):
        assert repo[f"wosac/{key}"] == pytest.approx(
            float(ref[f"wosac/{key}"]), abs=1e-6), key
    assert repo["wosac/scenario_counter"] == int(ref["wosac/scenario_counter"])


def test_long_curves(agg_pair):
    """Per-window aggregated curves + long buckets (:1441-1451,1487-1512)."""
    repo, ref = agg_pair
    for key in ("realism_meta_metric", "kinematic_metrics",
                "interactive_metrics", "map_based_metrics",
                "placement_based_metrics"):
        np.testing.assert_allclose(
            repo[f"wosac_long/{key}"], ref[f"wosac_long/{key}"],
            atol=1e-4, err_msg=key)
    for f in FIELDS:
        k = f"{f}_likelihood"
        np.testing.assert_allclose(
            repo[f"wosac_long_likelihood/{k}"],
            [round(float(x), 4) for x in ref[f"wosac_long_likelihood/{k}"]],
            atol=1e-9, err_msg=k)
