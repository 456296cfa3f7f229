"""Metric feature parity vs the reference torch kernels + likelihood sanity."""

import numpy as np
import pytest
import torch

from infgen_tpu.metrics import features as F
from infgen_tpu.metrics.wosac import WosacConfig, compute_scenario_metrics, make_log_distributions
from tests.ref_oracle import import_reference

import_reference()
from infgen.metrics import interact_features as ref_interact  # noqa: E402
from infgen.metrics import placement_features as ref_placement  # noqa: E402
from infgen.metrics import trajectory_features as ref_traj  # noqa: E402

A, T = 6, 40


def _tracks(seed=0):
    rng = np.random.default_rng(seed)
    xy = np.cumsum(rng.normal(0, 0.5, (A, T, 2)), axis=1).astype(np.float32)
    xy += rng.uniform(-20, 20, (A, 1, 2)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, (A, 1)).astype(np.float32) + \
        np.cumsum(rng.normal(0, 0.03, (A, T)), axis=1).astype(np.float32)
    valid = np.ones((A, T), bool)
    valid[2, :8] = False
    length = rng.uniform(2, 5, A).astype(np.float32)
    width = rng.uniform(1, 2, A).astype(np.float32)
    return xy, heading, valid, length, width


def test_kinematics_match_reference():
    xy, heading, valid, _, _ = _tracks(1)
    ls, la, as_, aa = F.compute_kinematic_features(
        xy[..., 0], xy[..., 1], np.zeros_like(xy[..., 0]), heading)
    rls, rla, ras, raa = ref_traj.compute_kinematic_features(
        torch.tensor(xy[..., 0]), torch.tensor(xy[..., 1]),
        torch.zeros(A, T), torch.tensor(heading), seconds_per_step=0.1)
    np.testing.assert_allclose(np.asarray(ls)[:, 1:-1], rls.numpy()[:, 1:-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(la)[:, 2:-2], rla.numpy()[:, 2:-2], atol=1e-3)
    np.testing.assert_allclose(np.asarray(as_)[:, 1:-1], ras.numpy()[:, 1:-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(aa)[:, 2:-2], raa.numpy()[:, 2:-2], atol=1e-3)


def test_kinematics_match_reference_nonzero_z():
    """3D kinematics with a real elevation profile: linear speed/accel must
    include the z component (trajectory_features.py:32-47 stacks dx,dy,dz).
    The repo threads logged z into GT features via AgentData.elevation
    (VERDICT r2 missing #3)."""
    xy, heading, valid, _, _ = _tracks(3)
    rng = np.random.default_rng(9)
    # hilly: up to ~8% grade, enough to shift speed bins on real WOMD scenes
    z = np.cumsum(rng.normal(0, 0.04, (A, T)), axis=1).astype(np.float32)
    ls, la, as_, aa = F.compute_kinematic_features(
        xy[..., 0], xy[..., 1], z, heading)
    rls, rla, ras, raa = ref_traj.compute_kinematic_features(
        torch.tensor(xy[..., 0]), torch.tensor(xy[..., 1]),
        torch.tensor(z), torch.tensor(heading), seconds_per_step=0.1)
    np.testing.assert_allclose(np.asarray(ls)[:, 1:-1], rls.numpy()[:, 1:-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(la)[:, 2:-2], rla.numpy()[:, 2:-2], atol=1e-3)
    np.testing.assert_allclose(np.asarray(as_)[:, 1:-1], ras.numpy()[:, 1:-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(aa)[:, 2:-2], raa.numpy()[:, 2:-2], atol=1e-3)
    # z must actually matter: planar speeds differ on this profile
    ls2d = F.compute_kinematic_features(
        xy[..., 0], xy[..., 1], np.zeros_like(z), heading)[0]
    assert np.nanmax(np.abs(np.asarray(ls) - np.asarray(ls2d))) > 1e-4


def test_metric_features_traj_z_plumbs_through():
    """compute_metric_features(traj_z=...) changes the GT kinematic features
    and nothing else (sim rollouts keep the reference's pred_z = 0)."""
    import jax.numpy as jnp

    A2, T2 = 4, 91
    rng = np.random.default_rng(5)
    xy = np.cumsum(rng.normal(0, 0.4, (A2, T2, 2)), 1).astype(np.float32)
    heading = np.zeros((A2, T2), np.float32)
    valid = np.ones((A2, T2), bool)
    z = np.cumsum(rng.normal(0, 0.05, (A2, T2)), 1).astype(np.float32)
    tok = np.zeros((A2, T2 // 5, 2), np.float32)
    st = np.ones((A2, T2 // 5), np.int32)
    kw = dict(length=np.full(A2, 4.0, np.float32),
              width=np.full(A2, 1.8, np.float32),
              slot_mask=np.ones(A2, bool), av_index=0,
              token_pos=tok, token_state=st)
    f2d = F.compute_metric_features(xy, heading, valid, **kw)
    f3d = F.compute_metric_features(xy, heading, valid, traj_z=z, **kw)
    assert float(jnp.nanmax(jnp.abs(
        f3d.linear_speed - f2d.linear_speed))) > 1e-5
    np.testing.assert_array_equal(np.asarray(f3d.distance_to_nearest_object),
                                  np.asarray(f2d.distance_to_nearest_object))


def test_distance_to_nearest_matches_reference():
    xy, heading, valid, length, width = _tracks(2)
    ours = F.compute_distance_to_nearest_object(
        xy[..., 0], xy[..., 1], length, width, heading, valid, np.ones(A, bool))
    ref = ref_interact.compute_distance_to_nearest_object(
        center_x=torch.tensor(xy[..., 0]), center_y=torch.tensor(xy[..., 1]),
        center_z=torch.zeros(A, T),
        length=torch.tensor(length)[:, None].expand(A, T),
        width=torch.tensor(width)[:, None].expand(A, T),
        height=torch.ones(A, T),
        heading=torch.tensor(heading), valid=torch.tensor(valid),
        evaluated_object_mask=torch.ones(A).bool(),
    )
    ours_np = np.asarray(ours)
    ref_np = ref.numpy()
    # compare where both are "real" distances (not the LARGE placeholder)
    m = (ref_np < 1e9) & (ours_np < 1e9)
    assert m.mean() > 0.8
    np.testing.assert_allclose(ours_np[m], ref_np[m], atol=1e-3)
    assert ((ours_np >= 1e9) == (ref_np >= 1e9)).all()


def test_ttc_matches_reference():
    xy, heading, valid, length, width = _tracks(3)
    # make two agents follow each other along +x for a meaningful TTC
    xy[0, :, 0] = np.linspace(0, 40, T); xy[0, :, 1] = 0; heading[0] = 0.0
    xy[1, :, 0] = np.linspace(8, 28, T); xy[1, :, 1] = 0; heading[1] = 0.0
    ours = F.compute_time_to_collision(
        xy[..., 0], xy[..., 1], length, width, heading, valid, np.ones(A, bool))
    ref = ref_interact.compute_time_to_collision_with_object_in_front(
        center_x=torch.tensor(xy[..., 0]), center_y=torch.tensor(xy[..., 1]),
        length=torch.tensor(length)[:, None].expand(A, T).contiguous(),
        width=torch.tensor(width)[:, None].expand(A, T).contiguous(),
        heading=torch.tensor(heading), valid=torch.tensor(valid),
        evaluated_object_mask=torch.ones(A).bool(), seconds_per_step=0.1,
    )
    np.testing.assert_allclose(np.asarray(ours)[:, 1:-1], ref.numpy()[:, 1:-1],
                               atol=1e-3)


def test_placement_matches_reference():
    rng = np.random.default_rng(4)
    Ttok = 12
    state = rng.integers(0, 4, (A, Ttok)).astype(np.int64)
    pos = rng.normal(0, 30, (A, Ttok, 2)).astype(np.float32)
    av = 0
    ids = np.arange(A)
    nb, ne = F.compute_num_placement(state.copy(), av, np.ones(A, bool))
    rnb, rne = ref_placement.compute_num_placement(
        valid=torch.ones(A, Ttok).bool(), state=torch.tensor(state.copy()),
        av_id=0, object_id=torch.tensor(ids),
        agent_state=['invalid', 'valid', 'enter', 'exit'])
    np.testing.assert_array_equal(np.asarray(nb), rnb.numpy())
    np.testing.assert_array_equal(np.asarray(ne), rne.numpy())

    db, de = F.compute_distance_placement(pos, state.copy(), av, np.ones(A, bool))
    rdb, rde = ref_placement.compute_distance_placement(
        position=torch.tensor(pos), state=torch.tensor(state.copy()),
        valid=torch.ones(A, Ttok).bool(), av_id=0, object_id=torch.tensor(ids),
        agent_state=['invalid', 'valid', 'enter', 'exit'])
    np.testing.assert_allclose(np.asarray(db), rdb.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(de), rde.numpy(), atol=1e-4)


@pytest.fixture(scope="module")
def sim_features():
    xy, heading, valid, length, width = _tracks(5)
    T10 = 91 + 30
    rng = np.random.default_rng(6)
    xy = np.cumsum(rng.normal(0.3, 0.2, (A, T10, 2)), axis=1).astype(np.float32)
    heading = np.zeros((A, T10), np.float32)
    valid = np.ones((A, T10), bool)
    Ttok = T10 // 5
    state = np.ones((A, Ttok), np.int64)
    token_pos = xy[:, ::5][:, :Ttok]
    return F.compute_metric_features(
        xy, heading, valid, length, width, np.ones(A, bool), 0,
        token_pos, state)


def test_likelihood_self_scoring(sim_features):
    """Scoring features against their own distribution gives high likelihoods."""
    cfg = WosacConfig()
    log_dist = make_log_distributions(cfg, sim_features)
    metrics = compute_scenario_metrics(cfg, log_dist, sim_features)
    assert 0.0 < float(metrics["metametric"]) <= 1.0001
    for name in cfg.fields():
        v = float(metrics[f"{name}_likelihood"])
        assert 0.0 <= v <= 1.0001, (name, v)
    # self-scored kinematics should be confidently likely
    assert float(metrics["linear_speed_likelihood"]) > 0.3
    long_curve = np.asarray(metrics["wosac_long/metametric"])
    assert long_curve.ndim == 1 and len(long_curve) >= 1


def test_road_edge_distance_matches_reference():
    from types import SimpleNamespace

    from infgen_tpu.metrics import map_distance as MD
    from infgen.metrics import map_features as ref_map

    rng = np.random.default_rng(7)
    # two road edges: straight line and a closed loop (cyclic)
    line = np.stack([np.linspace(0, 50, 26), np.full(26, 8.0), np.zeros(26)], -1)
    ang = np.linspace(0, 2 * np.pi, 33)
    loop = np.stack([30 + 20 * np.cos(ang), -10 + 20 * np.sin(ang),
                     np.zeros(33)], -1)
    polys_np = [line, loop]

    Aq, Tq = 4, 6
    xy = rng.uniform(0, 50, (Aq, Tq, 2)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, (Aq, Tq)).astype(np.float32)
    length = rng.uniform(2, 5, Aq).astype(np.float32)
    width = rng.uniform(1, 2, Aq).astype(np.float32)
    valid = np.ones((Aq, Tq), bool)

    packed, cyclic = MD.pack_polylines(polys_np)
    ours = MD.compute_distance_to_road_edge(
        xy[..., 0], xy[..., 1], length, width, heading, valid,
        np.ones(Aq, bool), packed, cyclic)

    ref_polys = [[SimpleNamespace(x=float(p[0]), y=float(p[1]), z=float(p[2]))
                  for p in poly] for poly in polys_np]
    ref = ref_map.compute_distance_to_road_edge(
        center_x=torch.tensor(xy[..., 0]), center_y=torch.tensor(xy[..., 1]),
        center_z=torch.zeros(Aq, Tq),
        length=torch.tensor(length)[:, None].expand(Aq, Tq).contiguous(),
        width=torch.tensor(width)[:, None].expand(Aq, Tq).contiguous(),
        height=torch.ones(Aq, Tq), heading=torch.tensor(heading),
        valid=torch.ones(Aq, Tq).bool(),
        evaluated_object_mask=torch.ones(Aq).bool(),
        road_edge_polylines=ref_polys)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-3)


def test_wosac_config_textproto_matches_defaults():
    import dataclasses

    from infgen_tpu.metrics.wosac import WosacConfig

    c = WosacConfig.from_textproto(
        "/root/reference/infgen/metrics/metric_config.textproto")
    d = WosacConfig()
    for f in dataclasses.fields(WosacConfig):
        assert getattr(c, f.name) == getattr(d, f.name), f.name


def test_offroad_in_metric_bundle():
    """Road-edge features flow through the bundle and the wosac scorer
    (reference compute_metrics.py:626-649 map bucket + simulated_offroad_rate
    proto field long_metrics.proto:145)."""
    from infgen_tpu.metrics import map_distance as MD

    rng = np.random.default_rng(11)
    T10 = 91
    # a corridor: road edges at y=+-10 wound so the road is to their left
    # (the reference's on-road sign convention, map_features.py:27-81);
    # agent 0 stays inside, agent 1 exits
    left = np.stack([np.linspace(200, -50, 40), np.full(40, 10.0)], -1)
    right = np.stack([np.linspace(-50, 200, 40), np.full(40, -10.0)], -1)
    packed, cyclic = MD.pad_packed_polylines(*MD.pack_polylines([left, right]))

    A2 = 2
    xy = np.zeros((A2, T10, 2), np.float32)
    xy[:, :, 0] = np.linspace(0, 80, T10)
    xy[1, :, 1] = np.linspace(0, 30, T10)  # drifts off-road
    heading = np.zeros((A2, T10), np.float32)
    valid = np.ones((A2, T10), bool)
    length = np.full(A2, 4.0, np.float32)
    width = np.full(A2, 1.8, np.float32)
    Ttok = T10 // 5
    state = np.ones((A2, Ttok), np.int64)

    f = F.compute_metric_features(
        xy, heading, valid, length, width, np.ones(A2, bool), 0,
        xy[:, ::5][:, :Ttok], state, packed, cyclic)
    off = np.asarray(f.offroad_per_step)
    assert not off[0].any(), "in-corridor agent flagged offroad"
    assert off[1, -1], "agent beyond the edge not flagged offroad"
    # distances are negative on-road, positive off-road
    d = np.asarray(f.distance_to_road_edge)
    assert d[0, 0] < 0 and d[1, -1] > 0

    cfg = WosacConfig()
    log_dist = make_log_distributions(cfg, f)
    m = compute_scenario_metrics(cfg, log_dist, f)
    assert 0.0 < float(m["simulated_offroad_rate"]) <= 1.0

    # without polylines the fields default to on-road
    f0 = F.compute_metric_features(
        xy, heading, valid, length, width, np.ones(A2, bool), 0,
        xy[:, ::5][:, :Ttok], state)
    m0 = compute_scenario_metrics(cfg, log_dist, f0)
    assert float(m0["simulated_offroad_rate"]) == 0.0


def test_road_edge_polylines_from_map():
    """Chain reconstruction from pt tokens (synthetic scenario road edges)."""
    from infgen_tpu.config import Config
    from infgen_tpu.data.synthetic import make_synthetic_scenario
    from infgen_tpu.metrics import map_distance as MD

    scen = make_synthetic_scenario(Config(), seed=0, num_agents=16)
    packed, cyclic = MD.road_edge_polylines_from_map(scen.map)
    assert packed.shape[0] >= 1
    # chains are ordered by chain_pos: consecutive points within ~10 m
    deltas = np.linalg.norm(np.diff(packed[..., :2], axis=1), axis=-1)
    seg_ok = (packed[:, :-1, 3] > 0) & (packed[:, 1:, 3] > 0)
    assert (deltas[seg_ok] < 10.0).all()


def test_unrolled_binning_matches_searchsorted():
    """The gather-free histogram binning / likelihood lookup must be
    bitwise-equal to the searchsorted formulation it replaced (which
    mirrors the reference's torch.histogram quirk semantics,
    compute_metrics.py:841-888)."""
    import jax
    import jax.numpy as jnp

    from infgen_tpu.metrics.features import unfold_axis
    from infgen_tpu.metrics.wosac import (WosacConfig, _histogram_log_probs,
                                          _uniform_bin_index,
                                          _value_log_likelihood)

    cfg = WosacConfig()
    rng = np.random.default_rng(0)
    for name in ("linear_speed", "linear_acceleration", "angular_speed",
                 "angular_acceleration", "distance_to_nearest_object",
                 "time_to_collision", "num_placement", "distance_placement"):
        spec = getattr(cfg, name)
        v = np.asarray(rng.uniform(spec.min_val - 1.0, spec.max_val + 1.0,
                                   size=4096), np.float32)
        v[::17] = np.nan  # NaNs must fall into bin 0 (reference quirk)
        v = jnp.asarray(v)
        edges = jnp.linspace(spec.min_val, spec.max_val, spec.num_bins + 1)
        clipped = jnp.clip(v, spec.min_val, spec.max_val)
        ref_idx = jnp.clip(
            jnp.searchsorted(edges, clipped, side="right") - 1,
            0, spec.num_bins - 1)
        got_idx = _uniform_bin_index(spec, clipped)
        ok = jnp.isfinite(v)
        assert bool((ref_idx == got_idx)[ok].all()), name

        lp = _histogram_log_probs(spec, v)
        in_range = ok & (v >= spec.min_val) & (v <= spec.max_val)
        old_idx = jnp.where(in_range, ref_idx, 0)
        assert bool((lp[old_idx] == _value_log_likelihood(spec, lp, v)).all()), name

    # unfold_axis == the index-gather sliding window it replaced
    x = jnp.asarray(rng.normal(size=(3, 5, 80)).astype(np.float32))
    size, step = 40, 5
    n = (80 - size) // step + 1
    idx = jnp.arange(n)[:, None] * step + jnp.arange(size)[None]
    assert bool((x[..., idx] == unfold_axis(x, size, step)).all())
