"""Distance-to-road-edge / offroad features.

JAX port of infgen/metrics/map_features.py:27-349: signed 2D distance from
every box corner to the nearest road-edge polyline segment (counterclockwise
winding: negative = on-road), with z-stretch disambiguation of overpasses and
cyclic-polyline handling. Excluded from the metametric like the reference
(compute_metrics.py:44-46) but available for the offroad diagnostics.

Polylines are packed as a fixed-shape tensor [n_poly, max_len, 4] (xyz +
validity), built host-side by `pack_polylines`.
"""

from typing import List

import jax.numpy as jnp
import numpy as np

EXTREMELY_LARGE_DISTANCE = 1e10
OFFROAD_DISTANCE_THRESHOLD = 0.0
_CYCLIC_TOLERANCE_M2 = 1.0
_Z_STRETCH = 3.0


def pack_polylines(polylines: List[np.ndarray]):
    """[n_poly, max_len, 4] xyz+valid tensor + cyclic flags (host side)."""
    polys = [np.asarray(p, np.float32) for p in polylines if len(p) >= 2]
    if not polys:
        return np.zeros((0, 2, 4), np.float32), np.zeros((0,), bool)
    max_len = max(p.shape[0] for p in polys)
    packed = np.zeros((len(polys), max_len, 4), np.float32)
    cyclic = np.zeros(len(polys), bool)
    for i, p in enumerate(polys):
        if p.shape[1] == 2:
            p = np.concatenate([p, np.zeros((p.shape[0], 1), np.float32)], -1)
        packed[i, :p.shape[0], :3] = p[:, :3]
        packed[i, :p.shape[0], 3] = 1.0
        cyclic[i] = ((p[0] - p[-1]) ** 2).sum() < _CYCLIC_TOLERANCE_M2
    return packed, cyclic


def road_edge_polylines_from_map(map_data, pt_type_min: int = 14,
                                 pt_type_max: int = 16):
    """Reconstruct road-edge polylines from a Scenario's pt tokens (host side).

    The reference reads raw road-edge polylines from the scenario proto
    (compute_metrics.py:630-636); our fixed-shape MapData instead carries the
    5 m pt-token chain (chain_id / chain_pos ordering, pt_type 14..16 =
    road_edge sub-types per data/preprocess.py:30), which reconstructs the
    same boundary at segment resolution. Returns `pack_polylines` output.
    """
    pt_type = np.asarray(map_data.pt_type)
    mask = np.asarray(map_data.mask)
    chain_id = np.asarray(map_data.chain_id)
    chain_pos = np.asarray(map_data.chain_pos)
    pos = np.asarray(map_data.position)
    sel = mask & (pt_type >= pt_type_min) & (pt_type <= pt_type_max)
    polys = []
    for c in np.unique(chain_id[sel]):
        idx = np.nonzero(sel & (chain_id == c))[0]
        order = idx[np.argsort(chain_pos[idx])]
        if len(order) >= 2:
            polys.append(pos[order])
    return pack_polylines(polys)


def pad_packed_polylines(packed, cyclic, round_polys: int = 8,
                         round_len: int = 32):
    """Round the packed shape up to multiples to bound jit retracing when
    feature extraction runs per scenario with varying road-edge counts."""
    L, S, _ = packed.shape
    Lp = max(((L + round_polys - 1) // round_polys) * round_polys, round_polys)
    Sp = max(((S + round_len - 1) // round_len) * round_len, round_len)
    out = np.zeros((Lp, Sp, 4), np.float32)
    out[:L, :S] = packed
    cyc = np.zeros(Lp, bool)
    cyc[:L] = cyclic
    return out, cyc


def packed_road_edges(map_data):
    """(packed, cyclic) road-edge tensors for `compute_metric_features`, or
    (None, None) when the scenario has no road edges. Host side."""
    packed, cyclic = road_edge_polylines_from_map(map_data)
    if packed.shape[0] == 0:
        return None, None
    return pad_packed_polylines(packed, cyclic)


def signed_distance_to_polylines(xyzs, polylines, is_cyclic=None,
                                 z_stretch: float = 1.0):
    """Signed 2D distance from query points to the polyline boundary.

    xyzs [P, 3]; polylines [L, S+1, 4]; is_cyclic [L] bool.
    Reference: _compute_signed_distance_to_polylines (map_features.py:139-349).
    """
    P = xyzs.shape[0]
    L, S1, _ = polylines.shape
    S = S1 - 1
    valid_pt = polylines[:, :, 3] > 0
    seg_valid = valid_pt[:, :-1] & valid_pt[:, 1:]
    if is_cyclic is None:
        is_cyclic = jnp.zeros(L, bool)

    starts = polylines[None, :, :-1, :3]
    ends = polylines[None, :, 1:, :3]
    s2p = xyzs[:, None, None, :] - starts            # [P, L, S, 3]
    s2e = ends - starts

    dot2 = lambda a, b: (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1])
    cross2 = lambda a, b: (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])

    num = dot2(s2p, s2e)
    den = dot2(s2e, s2e)
    rel_t = jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)
    n = jnp.sign(cross2(s2p, s2e))

    seg2pt = s2p - s2e * jnp.clip(rel_t, 0.0, 1.0)[..., None]
    stretch = jnp.array([1.0, 1.0, z_stretch])
    d3 = jnp.linalg.norm(seg2pt * stretch, axis=-1)
    d2 = jnp.linalg.norm(seg2pt[..., :2], axis=-1)

    s2e_pad = jnp.concatenate(
        [s2e[:, :, -1:, :2], s2e[..., :2], s2e[:, :, :1, :2]], axis=-2)
    convex = cross2(s2e_pad[:, :, :-1], s2e_pad[:, :, 1:]) > 0  # [P, L, S+1]

    n_prior = jnp.concatenate(
        [jnp.where(is_cyclic[None, :, None], n[:, :, -1:], n[:, :, :1]),
         n[:, :, :-1]], axis=-1)
    n_next = jnp.concatenate(
        [n[:, :, 1:], jnp.where(is_cyclic[None, :, None], n[:, :, :1],
                                n[:, :, -1:])], axis=-1)
    prior_valid = jnp.concatenate(
        [jnp.where(is_cyclic[:, None], seg_valid[:, -1:], seg_valid[:, :1]),
         seg_valid[:, :-1]], axis=-1)
    next_valid = jnp.concatenate(
        [seg_valid[:, 1:],
         jnp.where(is_cyclic[:, None], seg_valid[:, :1], seg_valid[:, -1:])],
        axis=-1)

    sign_before = jnp.where(convex[:, :, :-1], jnp.maximum(n, n_prior),
                            jnp.minimum(n, n_prior))
    sign_after = jnp.where(convex[:, :, 1:], jnp.maximum(n, n_next),
                           jnp.minimum(n, n_next))
    sign = jnp.where((rel_t < 0) & prior_valid[None], sign_before,
                     jnp.where((rel_t > 1) & next_valid[None], sign_after, n))

    d3 = jnp.where(seg_valid[None], d3, EXTREMELY_LARGE_DISTANCE).reshape(P, L * S)
    d2 = jnp.where(seg_valid[None], d2, EXTREMELY_LARGE_DISTANCE).reshape(P, L * S)
    sign = sign.reshape(P, L * S)

    idx = jnp.argmin(d3, axis=-1)
    return (jnp.take_along_axis(sign, idx[:, None], 1)[:, 0] *
            jnp.take_along_axis(d2, idx[:, None], 1)[:, 0])


def compute_distance_to_road_edge(cx, cy, length, width, heading, valid,
                                  slot_mask, polylines, is_cyclic):
    """[A, T] signed distance of the most off-road box corner.

    Reference: compute_distance_to_road_edge (map_features.py:27-81), z=0.
    """
    from infgen_tpu.metrics.features import box_corners_2d

    A, T = cx.shape
    corners = box_corners_2d(cx, cy,
                             jnp.broadcast_to(length[:, None], cx.shape),
                             jnp.broadcast_to(width[:, None], cx.shape),
                             heading)                          # [A, T, 4, 2]
    flat = corners.reshape(A * T * 4, 2)
    xyz = jnp.concatenate([flat, jnp.zeros((flat.shape[0], 1))], -1)
    sd = signed_distance_to_polylines(xyz, jnp.asarray(polylines),
                                      jnp.asarray(is_cyclic), _Z_STRETCH)
    sd = sd.reshape(A, T, 4).max(-1)
    ok = valid & slot_mask[:, None]
    return jnp.where(ok, sd, -EXTREMELY_LARGE_DISTANCE)
