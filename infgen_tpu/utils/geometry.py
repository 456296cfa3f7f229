"""Pure-array 2D geometry helpers shared across the framework.

Semantics match the reference implementation (infgen/utils/func.py:30-63 and
infgen/datasets/preprocess.py:23-55) but are written as jnp-compatible pure
functions usable under jit/vmap/scan on TPU.
"""

import math

import jax.numpy as jnp


def wrap_angle(angle, min_val: float = -math.pi, max_val: float = math.pi):
    """Wrap angles into [min_val, max_val). Reference: utils/func.py:58-63."""
    return min_val + (angle - min_val) % (max_val - min_val)


def angle_between_2d_vectors(ctr_vector, nbr_vector):
    """Signed angle of `nbr_vector` relative to `ctr_vector` in (-pi, pi].

    Reference: utils/func.py:30-35.
    Both inputs are [..., 2]; broadcastable.
    """
    cross = ctr_vector[..., 0] * nbr_vector[..., 1] - ctr_vector[..., 1] * nbr_vector[..., 0]
    dot = (ctr_vector[..., :2] * nbr_vector[..., :2]).sum(axis=-1)
    return jnp.arctan2(cross, dot)


def rot_mat_2d(theta, row_vector: bool = True):
    """2x2 rotation matrices for batched angles.

    With ``row_vector=True`` the matrix is laid out for right-multiplication of
    row vectors ``x @ R`` and rotates by +theta, matching the reference's
    ``torch.bmm(x, rot_mat)`` convention where
    ``rot_mat = [[cos, sin], [-sin, cos]]``
    (e.g. infgen/datasets/preprocess.py:606-612).
    Returns [..., 2, 2].
    """
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    if row_vector:
        return jnp.stack(
            [jnp.stack([cos, sin], axis=-1), jnp.stack([-sin, cos], axis=-1)], axis=-2
        )
    return jnp.stack(
        [jnp.stack([cos, -sin], axis=-1), jnp.stack([sin, cos], axis=-1)], axis=-2
    )


def transform_to_global(xy_local, origin, theta):
    """Rotate local xy by theta and translate by origin.

    xy_local: [..., 2]; origin: broadcastable [..., 2]; theta: broadcastable [...].
    Matches the token-to-world transform in preprocess.py:606-613.
    """
    rot = rot_mat_2d(theta)  # [..., 2, 2]
    rotated = jnp.einsum("...i,...ij->...j", xy_local, rot)
    return rotated + origin


def transform_to_local(xy_global, origin, theta):
    """Inverse of :func:`transform_to_global`."""
    rot = rot_mat_2d(-theta)
    return jnp.einsum("...i,...ij->...j", xy_global - origin, rot)


def cal_polygon_contour(pos, head, width_length):
    """Four bounding-box corners of agents.

    pos: [..., 2]; head: [...]; width_length: [..., 2] (width, length).
    Returns [..., 4, 2] in order (left_front, right_front, right_back,
    left_back). Reference: infgen/datasets/preprocess.py:23-55.
    """
    x, y = pos[..., 0], pos[..., 1]
    width, length = width_length[..., 0], width_length[..., 1]

    half_cos = 0.5 * jnp.cos(head)
    half_sin = 0.5 * jnp.sin(head)
    length_cos = length * half_cos
    length_sin = length * half_sin
    width_cos = width * half_cos
    width_sin = width * half_sin

    left_front = jnp.stack((x + length_cos - width_sin, y + length_sin + width_cos), axis=-1)
    right_front = jnp.stack((x + length_cos + width_sin, y + length_sin - width_cos), axis=-1)
    right_back = jnp.stack((x - length_cos + width_sin, y - length_sin - width_cos), axis=-1)
    left_back = jnp.stack((x - length_cos - width_sin, y - length_sin + width_cos), axis=-1)

    return jnp.stack((left_front, right_front, right_back, left_back), axis=-2)


def heading_from_contour(contour):
    """Heading angle implied by a 4-corner contour: left_front - left_back.

    contour: [..., 4, 2]. Reference: preprocess.py:416-417.
    """
    diff_xy = contour[..., 0, :] - contour[..., 3, :]
    return jnp.arctan2(diff_xy[..., 1], diff_xy[..., 0])
