"""Ego-relative grid / heading tokenizer.

TPU-native port of the reference `Attr_Tokenizer` (infgen/modules/attr_tokenizer.py):
a square grid of pitch `grid_interval` over `[-grid_range/2, grid_range/2]^2`,
masked to the disc of radius `radius` (= pl2seed_radius), used to classify
ego-relative insert positions; headings are binned at `angle_interval` degrees.

All encode/decode ops are pure jnp and jit/vmap-safe; the grid buffer is
precomputed host-side in numpy at construction.
"""

import math

import jax.numpy as jnp
import numpy as np

from infgen_tpu.utils.geometry import rot_mat_2d, wrap_angle


class AttrTokenizer:
    # The reference aligns the grid to a canonical heading of +pi/2
    # (attr_tokenizer.py:16): encoded positions are rotated so ego faces "up".
    HEADING = math.pi / 2

    def __init__(self, grid_range: float = 150.0, grid_interval: float = 3.0,
                 radius: float = 75.0, angle_interval: float = 3.0):
        self.grid_range = grid_range
        self.grid_interval = grid_interval
        self.radius = radius
        self.angle_interval = angle_interval

        # Grid construction mirrors attr_tokenizer.py:24-43: row-major xy
        # meshgrid, vertically flipped, centered, masked to the disc.
        num_grid = int(grid_range / grid_interval) + 1
        x = np.arange(num_grid, dtype=np.float32)
        gx, gy = np.meshgrid(x, x, indexing="xy")
        grid = np.stack([gx.ravel(), gy.ravel()], axis=-1)
        grid = grid.reshape(num_grid, num_grid, 2)[::-1].reshape(-1, 2)
        grid = (grid - num_grid // 2) * grid_interval

        dist = np.sqrt((grid ** 2).sum(-1))
        square_mask = (dist <= radius) | (dist == 0.0)
        self.num_grid = num_grid
        self.square_mask = square_mask
        # host-side numpy buffers: eager jnp here would dispatch to the device
        # at construction time (very costly on remote TPU backends); as numpy
        # they fold into jit programs as constants for free.
        self.grid = grid[square_mask].astype(np.float32)  # [grid_size, 2]
        self.dist = np.linalg.norm(self.grid, axis=-1)
        hx, hy = math.cos(self.HEADING), math.sin(self.HEADING)
        self.dir = np.arctan2(hx * self.grid[:, 1] - hy * self.grid[:, 0],
                              hx * self.grid[:, 0] + hy * self.grid[:, 1])

        self.grid_size = int(self.grid.shape[0])
        self.angle_size = int(360.0 / angle_interval)
        assert bool(np.all(np.asarray(self.grid[self.grid_size // 2]) == 0.0))

    # --- position ---

    def encode_pos(self, x, y, theta_y=None):
        """Grid-cell index + xy offset of world positions `x` relative to ego `y`.

        x: [..., 2]; y: broadcastable [..., 2]; theta_y: broadcastable [...].
        Returns (index [...], offset_xy [..., 2]).
        Reference: attr_tokenizer.py:77-89.
        """
        centered = x - y
        if theta_y is not None:
            rot = rot_mat_2d(-(theta_y - self.HEADING))
            centered = jnp.einsum("...i,...ij->...j", centered, rot)
        d2 = ((centered[..., None, :] - self.grid) ** 2).sum(-1)  # [..., grid_size]
        index = jnp.argmin(d2, axis=-1)
        offset = centered - jnp.asarray(self.grid)[index]
        return index, offset

    def decode_pos(self, index, y=None, theta_y=None):
        """Inverse of encode_pos (cell center only). Reference: attr_tokenizer.py:91-99."""
        centered = jnp.asarray(self.grid)[index]
        if y is not None:
            if theta_y is not None:
                rot = rot_mat_2d(theta_y - self.HEADING)
                centered = jnp.einsum("...i,...ij->...j", centered, rot)
            return centered + y
        return centered

    # --- heading ---

    def encode_heading(self, heading):
        """120-way heading bin. Reference: attr_tokenizer.py:101-104."""
        deg = (wrap_angle(heading) + math.pi) / (2 * math.pi) * 360.0
        return (deg // self.angle_interval).astype(jnp.int32)

    def decode_heading(self, index):
        """Bin index -> radians in [-pi, pi). Reference: attr_tokenizer.py:106-110."""
        angles = index * self.angle_interval - 180.0
        return (angles / 360.0 * (2 * math.pi)).astype(jnp.float32)

    # --- visualization helper ---

    def pad_square(self, prob, indices=None):
        """Scatter disc-masked values back onto the full square grid for plotting.

        Reference: attr_tokenizer.py:57-68. Host-side numpy.
        """
        prob = np.asarray(prob)
        pad = np.zeros((*prob.shape[:-1], self.square_mask.shape[0]))
        pad[..., self.square_mask] = prob
        square_indices = np.arange(self.square_mask.shape[0])
        circle_indices = np.concatenate([square_indices[self.square_mask], [-1]])
        if indices is not None:
            indices = circle_indices[np.asarray(indices)]
        return pad, indices
