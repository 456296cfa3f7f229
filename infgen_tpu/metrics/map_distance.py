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
