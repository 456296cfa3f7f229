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

import jax
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


def _downmost_edge_xy(bx, by):
    """SoA downmost edge of CCW boxes; bx/by [..., 4, T].

    Returns (start_idx [..., 1, T], dir_x, dir_y [..., 1, T]) — the
    geometry of geometry_utils.py:10-36's helper, laid out with time minor
    so every tensor tiles the TPU's (8, 128) register shape. The original
    array-of-structs form carries trailing [..., 4, 2]/[..., 8, 1] axes
    whose layout padding inflates HBM 64-128x at [B, A, A, T] scale (a
    measured 20.9 GB allocation at B=8, A=128, T=311).
    """
    idx = jnp.argmin(by, axis=-2, keepdims=True)
    sx = jnp.take_along_axis(bx, idx, axis=-2)
    sy = jnp.take_along_axis(by, idx, axis=-2)
    ex = jnp.take_along_axis(bx, (idx + 1) % 4, axis=-2) - sx
    ey = jnp.take_along_axis(by, (idx + 1) % 4, axis=-2) - sy
    n = jnp.sqrt(ex * ex + ey * ey)
    return idx, ex / n, ey / n


_MINK_ORDER1 = (0, 0, 1, 1, 2, 2, 3, 3)
_MINK_ORDER2 = (0, 1, 1, 2, 2, 3, 3, 0)


def _select_vertex(bx, order):
    """bx [..., 4, T] broadcastable, order [..., 8, T] in {0..3} ->
    [..., 8, T]: vertex gather as a where-chain (a take_along_axis here
    materializes an s32 [..., 8, 1]-minor index tensor; see
    _downmost_edge_xy)."""
    out = jax.lax.index_in_dim(bx, 3, axis=-2, keepdims=True)
    for k in (2, 1, 0):
        out = jnp.where(order == k,
                        jax.lax.index_in_dim(bx, k, axis=-2, keepdims=True),
                        out)
    return out


def _minkowski_sum_xy(b1x, b1y, s1, d1x, d1y, b2x, b2y, s2, d2x, d2y):
    """Minkowski sum of two CCW boxes -> 8-gon, SoA [..., 8, T].

    geometry_utils.py:10-36; per-box downmost edges precomputed by the
    caller (they depend on one box only, so they are computed once per
    agent, not once per pair).
    """
    cross = d1x * d2y - d1y * d2x                      # [..., 1, T]
    cond = cross >= 0.0
    o1 = jnp.array(_MINK_ORDER1, jnp.int32)[:, None]
    o2 = jnp.array(_MINK_ORDER2, jnp.int32)[:, None]
    box1_order = (jnp.where(cond, o2, o1) + s1) % 4    # [..., 8, T]
    box2_order = (jnp.where(cond, o1, o2) + s2) % 4
    px = _select_vertex(b1x, box1_order) + _select_vertex(b2x, box2_order)
    py = _select_vertex(b1y, box1_order) + _select_vertex(b2y, box2_order)
    return px, py


def _signed_distance_origin_xy(px, py):
    """Signed distance origin -> convex polygon, SoA: px/py [..., P, T].

    geometry_utils.py:39-66 with query point = 0, time-minor layout.
    """
    nxx = jnp.roll(px, -1, axis=-2)
    nxy = jnp.roll(py, -1, axis=-2)
    ex, ey = nxx - px, nxy - py
    edge_len = jnp.sqrt(ex * ex + ey * ey)
    eps = jnp.finfo(px.dtype).eps
    tx, ty = ex / (edge_len + eps), ey / (edge_len + eps)
    nx, ny = -ty, tx                                   # left normal
    # v2q = origin - vertex = (-px, -py)
    vert_dist = jnp.sqrt(px * px + py * py)
    perp = nx * px + ny * py                           # (-n) . v2q
    is_inside = (perp <= 0).all(axis=-2)
    proj = (tx * -px + ty * -py) / (edge_len + eps)
    on_edge = (proj >= 0) & (proj <= 1)
    edge_dist = jnp.where(on_edge, jnp.abs(perp), jnp.inf)
    min_dist = jnp.minimum(edge_dist.min(-2), vert_dist.min(-2))
    return jnp.where(is_inside, -min_dist, min_dist)


# ------------------------------------------------------------------ #
# interactive features
# ------------------------------------------------------------------ #

def compute_distance_to_nearest_object(cx, cy, length, width, heading, valid,
                                       slot_mask,
                                       corner_rounding=CORNER_ROUNDING_FACTOR,
                                       eval_chunk=32):
    """[A, T] signed distance to the nearest other object.

    interact_features.py:19-93, with the padded-slot mask replacing the
    eval/other split (we evaluate all active slots).

    TPU layout: all pairwise tensors are [A_chunk, A, 8-gon, T] — time
    minor (tiles the (8, 128) vector shape), polygon axes never trailing.
    The evaluated-agent axis runs in `eval_chunk`-row chunks under
    `lax.map`, bounding peak HBM to O(eval_chunk * A * 8 * T) per live
    intermediate; at A=128, T=311 the un-chunked AoS form compiled to a
    20.9 GB layout-padded allocation (batch 8).
    """
    shrink = jnp.minimum(length, width) * corner_rounding / 2.0
    l_s = length - 2 * shrink
    w_s = width - 2 * shrink
    corners = box_corners_2d(cx, cy, l_s[..., None] * jnp.ones_like(cx),
                             w_s[..., None] * jnp.ones_like(cx), heading)  # [A, T, 4, 2]
    bx = corners[..., 0].swapaxes(-1, -2)                # [A, 4, T]
    by = corners[..., 1].swapaxes(-1, -2)

    # per-box downmost edges, once per agent (not per pair): the "other"
    # box enters the Minkowski sum negated (geometry_utils.py:19-23)
    s1, d1x, d1y = _downmost_edge_xy(bx, by)             # [A, 1, T]
    s2, d2x, d2y = _downmost_edge_xy(-bx, -by)

    A, T = cx.shape
    row_valid = valid & slot_mask[:, None]               # [A, T]

    Ac = min(eval_chunk, A)
    n_chunk = -(-A // Ac)
    A_pad = n_chunk * Ac

    def padc(x):                                         # pad eval axis
        if A_pad == A:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((A_pad - A, *x.shape[1:]), x.dtype)], axis=0)

    def chunk_fn(args):
        ebx, eby, es1, ed1x, ed1y, eshrink, evalid, eids = args
        # pair geometry: eval rows [Ac, 1, ...] x all rows [1, A, ...]
        px, py = _minkowski_sum_xy(
            ebx[:, None], eby[:, None], es1[:, None], ed1x[:, None],
            ed1y[:, None], -bx[None], -by[None], s2[None], d2x[None],
            d2y[None])                                   # [Ac, A, 8, T]
        sd = _signed_distance_origin_xy(px, py)          # [Ac, A, T]
        sd = sd - eshrink[:, None, None] - shrink[None, :, None]
        self_pair = (eids[:, None] == jnp.arange(A)[None])[..., None]
        sd = sd + self_pair * EXTREMELY_LARGE_DISTANCE
        pair_valid = evalid[:, None] & row_valid[None]
        sd = jnp.where(pair_valid, sd, EXTREMELY_LARGE_DISTANCE)
        return sd.min(axis=1)                            # [Ac, T]

    chunked = lambda x: padc(x).reshape(n_chunk, Ac, *x.shape[1:])
    out = jax.lax.map(chunk_fn, (
        chunked(bx), chunked(by), chunked(s1), chunked(d1x), chunked(d1y),
        chunked(shrink), chunked(row_valid), chunked(jnp.arange(A))))
    return out.reshape(A_pad, T)[:A]


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


def unfold_axis(x, size: int, step: int):
    """Sliding windows over the last axis -> [..., n_window, size].

    Built from n static slices (stacked), NOT a gather with a [n, size]
    index array: minor-axis gathers are effectively scalar on TPU and made
    WOSAC scoring ~4x slower than the whole rollout it scores.
    """
    n = (x.shape[-1] - size) // step + 1
    wins = [jax.lax.slice_in_dim(x, i * step, i * step + size, axis=-1)
            for i in range(n)]
    return jnp.stack(wins, axis=-2)


def unfold_features(f: MetricFeatures, size: int = N_SIMULATION_STEPS,
                    step: int = SHIFT) -> MetricFeatures:
    """Sliding windows along time -> [..., n_window, size].

    The long-horizon twist (MetricFeatures.unfold, compute_metrics.py:540-557):
    placement features use token-rate windows (size//SHIFT, step//SHIFT).
    Windows clamp to the available horizon for short rollouts.
    """
    size = min(size, int(f.valid.shape[-1]))

    uf = unfold_axis

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
