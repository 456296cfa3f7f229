"""Token vocabulary loading.

The motion vocab is 2048 contour trajectories per agent class, shape
(V, 6, 4, 2): 6 interpolation sub-steps x 4 box corners x xy, in the local
frame of the previous token pose. The map vocab is 1024 polyline templates
(V, 11, 2). Shipped as .npz fixed-shape arrays (converted from the reference's
pickles: infgen/tokens/agent_vocab_555_s2.pkl, map_traj_token5.pkl).
"""

import os
from typing import Dict

import numpy as np

_TOKENS_DIR = os.path.join(os.path.dirname(__file__), "..", "tokens")


def load_agent_vocab(path: str = None) -> Dict[str, np.ndarray]:
    """Host-side numpy arrays: they fold into jit programs as constants."""
    path = path or os.path.join(_TOKENS_DIR, "agent_vocab.npz")
    data = np.load(path)
    return {k: np.asarray(data[k], np.float32) for k in ("veh", "ped", "cyc")}


def load_map_vocab(path: str = None) -> Dict[str, np.ndarray]:
    path = path or os.path.join(_TOKENS_DIR, "map_vocab.npz")
    data = np.load(path)
    out = {k: np.asarray(data[k], np.float32) for k in ("traj_src", "sample_pt")}
    # heading at the end of each template (model/infgen.py:206-207)
    traj = np.asarray(data["traj_src"])
    end_theta = np.arctan2(traj[:, -1, 1] - traj[:, -2, 1], traj[:, -1, 0] - traj[:, -2, 0])
    out["traj_end_theta"] = np.asarray(end_theta, np.float32)
    return out
