"""WOSAC metric feature kernels (JAX).

Ports of the reference feature extractors — already vectorized tensor math,
translated to jnp with fixed shapes:
  - kinematics: infgen/metrics/trajectory_features.py:32-52
  - nearest-object distance / collisions: interact_features.py:19-93 +
    geometry_utils.py:10-66 + box_utils.py:77-113
  - time-to-collision: interact_features.py:96-220
  - placement: placement_features.py:6-48

All functions take padded [A, T] arrays plus an active-slot mask.
"""

import math
from typing import NamedTuple

import jax.numpy as jnp

from infgen_tpu.config import ENTER_STATE, EXIT_STATE, SHIFT

EXTREMELY_LARGE_DISTANCE = 1e10
COLLISION_DISTANCE_THRESHOLD = 0.0
CORNER_ROUNDING_FACTOR = 0.7
MAX_HEADING_DIFF = math.radians(75.0)
MAX_HEADING_DIFF_FOR_SMALL_OVERLAP = math.radians(10.0)
SMALL_OVERLAP_THRESHOLD = 0.5
MAXIMUM_TIME_TO_COLLISION = 5.0
CURRENT_TIME_INDEX = 10
N_SIMULATION_STEPS = 80  # WOSAC window length
SECONDS_PER_STEP = 0.1


# ------------------------------------------------------------------ #
# kinematics
# ------------------------------------------------------------------ #

def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def central_diff(t, pad_value):
    pad = jnp.full((*t.shape[:-1], 1), pad_value, t.dtype)
    return jnp.concatenate([pad, (t[..., 2:] - t[..., :-2]) / 2, pad], axis=-1)


def central_logical_and(t, pad_value: bool):
    pad = jnp.full((*t.shape[:-1], 1), pad_value, bool)
    return jnp.concatenate([pad, t[..., 2:] & t[..., :-2], pad], axis=-1)


def compute_kinematic_features(x, y, z, heading, seconds_per_step=SECONDS_PER_STEP):
    """(linear_speed, linear_accel, angular_speed, angular_accel), NaN-padded."""
    dpos = central_diff(jnp.stack([x, y, z]), jnp.nan)
    linear_speed = jnp.linalg.norm(dpos, axis=0) / seconds_per_step
    linear_accel = central_diff(linear_speed, jnp.nan) / seconds_per_step
    dh_step = _wrap(central_diff(heading, jnp.nan) * 2) / 2
    dh = dh_step / seconds_per_step
    d2h_step = _wrap(central_diff(dh_step, jnp.nan) * 2) / 2
    d2h = d2h_step / seconds_per_step ** 2
    return linear_speed, linear_accel, dh, d2h


def compute_kinematic_validity(valid):
    speed_validity = central_logical_and(valid, False)
    accel_validity = central_logical_and(speed_validity, False)
    return speed_validity, accel_validity


# ------------------------------------------------------------------ #
# box geometry (geometry_utils.py / box_utils.py)
# ------------------------------------------------------------------ #

def box_corners_2d(cx, cy, length, width, heading):
    """First 4 (bottom) corners of upright boxes, CCW: box_utils.py:77-113."""
    l2, w2 = length * 0.5, width * 0.5
    local = jnp.stack([
        jnp.stack([l2, w2], -1),
        jnp.stack([-l2, w2], -1),
        jnp.stack([-l2, -w2], -1),
        jnp.stack([l2, -w2], -1),
    ], axis=-2)                                          # [..., 4, 2]
    cos, sin = jnp.cos(heading), jnp.sin(heading)
    rot = jnp.stack([jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2)
    world = jnp.einsum("...ij,...kj->...ki", rot, local)
    return world + jnp.stack([cx, cy], -1)[..., None, :]


def _downmost_edge(box):
    """box [..., 4, 2] -> (start_idx [..., 1], edge_dir [..., 1, 2])."""
    idx = jnp.argmin(box[..., 1], axis=-1, keepdims=True)
    start = jnp.take_along_axis(box, idx[..., None], axis=-2)
    end = jnp.take_along_axis(box, ((idx + 1) % 4)[..., None], axis=-2)
    edge = end - start
    return idx, edge / jnp.linalg.norm(edge, axis=-1, keepdims=True)


def minkowski_sum_of_boxes(box1, box2):
    """Minkowski sum of two CCW boxes -> 8-gon. geometry_utils.py:10-36."""
    order1 = jnp.array([0, 0, 1, 1, 2, 2, 3, 3])
    order2 = jnp.array([0, 1, 1, 2, 2, 3, 3, 0])
    s1, d1 = _downmost_edge(box1)
    s2, d2 = _downmost_edge(box2)
    cross = d1[..., 0, 0] * d2[..., 0, 1] - d1[..., 0, 1] * d2[..., 0, 0]
    cond = (cross >= 0.0)[..., None]
    box1_order = (jnp.where(cond, order2, order1) + s1) % 4
    box2_order = (jnp.where(cond, order1, order2) + s2) % 4
    p1 = jnp.take_along_axis(box1, box1_order[..., None], axis=-2)
    p2 = jnp.take_along_axis(box2, box2_order[..., None], axis=-2)
    return p1 + p2


def signed_distance_origin_to_polygon(poly):
    """Signed distance from the origin to convex polygons [..., P, 2].

    geometry_utils.py:39-66 with query point = 0.
    """
    first = poly[..., :1, :]
    nxt = jnp.concatenate([poly[..., 1:, :], first], axis=-2)
    edge = nxt - poly
    edge_len = jnp.linalg.norm(edge, axis=-1)
    eps = jnp.finfo(poly.dtype).eps
    tangent = edge / (edge_len[..., None] + eps)
    normal = jnp.stack([-tangent[..., 1], tangent[..., 0]], axis=-1)

    v2q = -poly                                          # origin - vertices
    vert_dist = jnp.linalg.norm(v2q, axis=-1)
    perp = (-normal * v2q).sum(-1)
    is_inside = (perp <= 0).all(axis=-1)
    proj = (tangent * v2q).sum(-1) / (edge_len + eps)
    on_edge = (proj >= 0) & (proj <= 1)
    edge_dist = jnp.where(on_edge, jnp.abs(perp), jnp.inf)
    min_dist = jnp.minimum(edge_dist.min(-1), vert_dist.min(-1))
    return jnp.where(is_inside, -min_dist, min_dist)


# ------------------------------------------------------------------ #
# interactive features
# ------------------------------------------------------------------ #

def compute_distance_to_nearest_object(cx, cy, length, width, heading, valid,
                                       slot_mask,
                                       corner_rounding=CORNER_ROUNDING_FACTOR):
    """[A, T] signed distance to the nearest other object.

    interact_features.py:19-93, with the padded-slot mask replacing the
    eval/other split (we evaluate all active slots).
    """
    shrink = jnp.minimum(length, width) * corner_rounding / 2.0
    l_s = length - 2 * shrink
    w_s = width - 2 * shrink
    corners = box_corners_2d(cx, cy, l_s[..., None] * jnp.ones_like(cx),
                             w_s[..., None] * jnp.ones_like(cx), heading)  # [A, T, 4, 2]

    A = cx.shape[0]
    eval_c = corners[:, None]                            # [A, 1, T, 4, 2]
    all_c = corners[None]                                # [1, A, T, 4, 2]
    mink = minkowski_sum_of_boxes(
        jnp.broadcast_to(eval_c, (A, A, *corners.shape[1:])),
        -jnp.broadcast_to(all_c, (A, A, *corners.shape[1:])))
    sd = signed_distance_origin_to_polygon(mink)         # [A, A, T]
    sd = sd - shrink[:, None, None] - shrink[None, :, None]

    eye = jnp.eye(A, dtype=bool)[..., None]
    sd = sd + eye * EXTREMELY_LARGE_DISTANCE
    pair_valid = (valid & slot_mask[:, None])[:, None] & \
                 (valid & slot_mask[:, None])[None]
    sd = jnp.where(pair_valid, sd, EXTREMELY_LARGE_DISTANCE)
    return sd.min(axis=1)


def compute_time_to_collision(cx, cy, length, width, heading, valid, slot_mask,
                              seconds_per_step=SECONDS_PER_STEP):
    """[A, T] time to collision with the object in front.

    interact_features.py:96-172.
    """
    speed = compute_kinematic_features(cx, cy, jnp.zeros_like(cx), heading,
                                       seconds_per_step)[0]     # [A, T]
    # [T, A, ...] layout
    tr = lambda x: x.swapaxes(0, 1)
    xy = jnp.stack([tr(cx), tr(cy)], -1)                 # [T, A, 2]
    sizes = jnp.stack([jnp.broadcast_to(length[:, None], cx.shape),
                       jnp.broadcast_to(width[:, None], cx.shape)], -1).swapaxes(0, 1)
    yaw = tr(heading)
    v = tr(valid & slot_mask[:, None])

    yaw_diff = jnp.abs(yaw[:, None, :] - yaw[:, :, None])       # [T, Ae, Ao]
    ydc, yds = jnp.cos(yaw_diff), jnp.sin(yaw_diff)
    other_long = (sizes[:, None] / 2 * jnp.abs(jnp.stack([ydc, yds], -1))).sum(-1)
    other_lat = (sizes[:, None] / 2 * jnp.abs(jnp.stack([yds, ydc], -1))).sum(-1)

    rel = xy[:, None, :] - xy[:, :, None, :]                    # [T, Ae, Ao, 2]
    cos_e, sin_e = jnp.cos(-yaw), jnp.sin(-yaw)
    rx = cos_e[:, :, None] * rel[..., 0] - sin_e[:, :, None] * rel[..., 1]
    ry = sin_e[:, :, None] * rel[..., 0] + cos_e[:, :, None] * rel[..., 1]

    long_d = rx - sizes[:, :, None, 0] / 2 - other_long
    lat_ov = jnp.abs(ry) - sizes[:, :, None, 1] / 2 - other_lat

    follow = (long_d > 0) & (yaw_diff <= MAX_HEADING_DIFF) & (lat_ov < 0) & (
        (lat_ov < -SMALL_OVERLAP_THRESHOLD) |
        (yaw_diff <= MAX_HEADING_DIFF_FOR_SMALL_OVERLAP))
    vmask = v[:, None, :] & follow
    masked_long = long_d + (1.0 - vmask.astype(long_d.dtype)) * EXTREMELY_LARGE_DISTANCE

    ahead = masked_long.argmin(-1)                              # [T, Ae]
    dist_ahead = jnp.take_along_axis(masked_long, ahead[..., None], -1)[..., 0]
    speed_t = tr(speed)                                         # [T, A]
    speed_ahead = jnp.take_along_axis(speed_t, ahead, -1)
    rel_speed = speed_t - speed_ahead
    ttc = jnp.where(rel_speed > 0,
                    jnp.minimum(dist_ahead / rel_speed, MAXIMUM_TIME_TO_COLLISION),
                    MAXIMUM_TIME_TO_COLLISION)
    return ttc.swapaxes(0, 1)


# ------------------------------------------------------------------ #
# placement features
# ------------------------------------------------------------------ #

def compute_num_placement(state, av_index, slot_mask):
    """Per-token-step enter/exit counts excluding ego. placement_features.py:6-26."""
    st = jnp.where((jnp.arange(state.shape[0]) == av_index)[:, None], -1, state)
    st = jnp.where(slot_mask[:, None], st, -1)
    return (st == ENTER_STATE).sum(0), (st == EXIT_STATE).sum(0)


def compute_distance_placement(position, state, av_index, slot_mask):
    """Per-agent enter/exit distance to ego. placement_features.py:29-48."""
    st = jnp.where((jnp.arange(state.shape[0]) == av_index)[:, None], -1, state)
    st = jnp.where(slot_mask[:, None], st, -1)
    dist = jnp.linalg.norm(position - position[av_index][None], axis=-1)
    return dist * (st == ENTER_STATE), dist * (st == EXIT_STATE)


# ------------------------------------------------------------------ #
# bundle
# ------------------------------------------------------------------ #

class MetricFeatures(NamedTuple):
    """Future-horizon features. 10 Hz arrays are [A, T_future]; token-rate
    placement arrays are [., T_future/SHIFT]. Reference: compute_metrics.py:500+."""

    valid: jnp.ndarray
    linear_speed: jnp.ndarray
    linear_acceleration: jnp.ndarray
    angular_speed: jnp.ndarray
    angular_acceleration: jnp.ndarray
    distance_to_nearest_object: jnp.ndarray
    collision_per_step: jnp.ndarray
    time_to_collision: jnp.ndarray
    distance_to_road_edge: jnp.ndarray  # [A, T_future]
    offroad_per_step: jnp.ndarray       # [A, T_future] bool
    num_placement: jnp.ndarray        # [1, T_tok]
    num_removement: jnp.ndarray       # [1, T_tok]
    distance_placement: jnp.ndarray   # [A, T_tok]
    distance_removement: jnp.ndarray  # [A, T_tok]


def compute_metric_features(traj_xy, traj_heading, valid, length, width,
                            slot_mask, av_index, token_pos, token_state,
                            road_edge_polylines=None, road_edge_cyclic=None,
                            traj_z=None) -> MetricFeatures:
    """Features from one rollout.

    traj_xy [A, T10, 2] full 10 Hz trajectory (history + future);
    valid [A, T10]; length/width [A]; token_pos [A, T_tok, 2];
    token_state [A, T_tok]. Mirrors compute_metric_features
    (compute_metrics.py:560-706).

    traj_z [A, T10]: elevation for 3D linear speed/accel (the reference's
    kinematics are 3D, trajectory_features.py:32-47). Pass the logged z for
    GT/log features; omit for simulated rollouts — the reference hardcodes
    sim pred_z = 0 (agent_decoder.py:2338), so sim kinematics are planar on
    both sides.

    road_edge_polylines [L, S, 4] + road_edge_cyclic [L] (pack_polylines
    output) enable the map bucket (distance_to_road_edge / offroad_per_step,
    compute_metrics.py:626-649); without them the fields are filled with
    on-road defaults (the reference leaves them uninitialized via empty_like
    when scenario_log is None, :626-628).
    """
    x, y = traj_xy[..., 0], traj_xy[..., 1]
    z = jnp.zeros_like(x) if traj_z is None else traj_z
    cut = CURRENT_TIME_INDEX + 1

    ls, la, as_, aa = compute_kinematic_features(x, y, z, traj_heading)
    ls, la, as_, aa = (t[:, cut:] for t in (ls, la, as_, aa))

    d_nearest = compute_distance_to_nearest_object(
        x, y, length, width, traj_heading, valid, slot_mask)[:, cut:]
    collision = d_nearest < COLLISION_DISTANCE_THRESHOLD

    ttc = compute_time_to_collision(x, y, length, width, traj_heading, valid,
                                    slot_mask)[:, cut:]

    if road_edge_polylines is not None and road_edge_polylines.shape[0] > 0:
        from infgen_tpu.metrics.map_distance import (
            OFFROAD_DISTANCE_THRESHOLD,
            compute_distance_to_road_edge,
        )
        d_road = compute_distance_to_road_edge(
            x, y, length, width, traj_heading, valid, slot_mask,
            road_edge_polylines, road_edge_cyclic)[:, cut:]
        offroad = d_road > OFFROAD_DISTANCE_THRESHOLD
    else:
        d_road = jnp.full_like(ls, -EXTREMELY_LARGE_DISTANCE)
        offroad = jnp.zeros_like(collision)

    n_place, n_remove = compute_num_placement(token_state, av_index, slot_mask)
    tok_cut = CURRENT_TIME_INDEX // SHIFT
    n_place = n_place[tok_cut:]
    n_remove = n_remove[tok_cut:]
    d_place, d_remove = compute_distance_placement(token_pos, token_state,
                                                   av_index, slot_mask)
    d_place = d_place[:, tok_cut:]
    d_remove = d_remove[:, tok_cut:]

    return MetricFeatures(
        valid=valid[:, cut:] & slot_mask[:, None],
        linear_speed=ls, linear_acceleration=la,
        angular_speed=as_, angular_acceleration=aa,
        distance_to_nearest_object=d_nearest,
        collision_per_step=collision,
        time_to_collision=ttc,
        distance_to_road_edge=d_road,
        offroad_per_step=offroad,
        num_placement=n_place[None],
        num_removement=n_remove[None],
        distance_placement=d_place,
        distance_removement=d_remove,
    )


def unfold_features(f: MetricFeatures, size: int = N_SIMULATION_STEPS,
                    step: int = SHIFT) -> MetricFeatures:
    """Sliding windows along time -> [..., n_window, size].

    The long-horizon twist (MetricFeatures.unfold, compute_metrics.py:540-557):
    placement features use token-rate windows (size//SHIFT, step//SHIFT).
    Windows clamp to the available horizon for short rollouts.
    """
    size = min(size, int(f.valid.shape[-1]))

    def uf(x, s, st):
        n = (x.shape[-1] - s) // st + 1
        idx = jnp.arange(n)[:, None] * st + jnp.arange(s)[None]
        return x[..., idx]

    return MetricFeatures(
        valid=uf(f.valid, size, step),
        linear_speed=uf(f.linear_speed, size, step),
        linear_acceleration=uf(f.linear_acceleration, size, step),
        angular_speed=uf(f.angular_speed, size, step),
        angular_acceleration=uf(f.angular_acceleration, size, step),
        distance_to_nearest_object=uf(f.distance_to_nearest_object, size, step),
        collision_per_step=uf(f.collision_per_step, size, step),
        time_to_collision=uf(f.time_to_collision, size, step),
        distance_to_road_edge=uf(f.distance_to_road_edge, size, step),
        offroad_per_step=uf(f.offroad_per_step, size, step),
        num_placement=uf(f.num_placement, size // SHIFT, step // SHIFT),
        num_removement=uf(f.num_removement, size // SHIFT, step // SHIFT),
        distance_placement=uf(f.distance_placement, size // SHIFT, step // SHIFT),
        distance_removement=uf(f.distance_removement, size // SHIFT, step // SHIFT),
    )
