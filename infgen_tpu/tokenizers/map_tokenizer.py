"""Map tokenization: raw polylines -> 5 m "pt tokens" matched to the map vocab.

Port of the reference's static map tokenization
(infgen/datasets/preprocess.py:693-760 + interplating_polyline:58-139) and
map-token matching (infgen/model/infgen.py:918-984).

Polyline splitting is host-side numpy (offline preprocessing); vocab matching
is vectorized jnp (runs on device or host).
"""

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.tokenizers.vocab import load_map_vocab


def interpolate_polyline(points: np.ndarray, headings: np.ndarray,
                         distance: float = 0.5, split_distance: float = 5.0,
                         use_native: bool = True) -> Optional[np.ndarray]:
    """Resample a polyline at `distance` m and split into 5 m 3-point segments.

    Returns [n_seg, 3, 3] (x, y, theta) or None. Mirrors
    interplating_polyline (preprocess.py:58-139): break the polyline where
    heading jumps or gaps occur, upsample each piece with linear interp,
    window into (split/distance+1)-point chunks, and keep every 5th point.

    Dispatches to the C++ kernel (native/womd_native.cc) when built.
    """
    if use_native:
        try:
            from infgen_tpu.data.native import available, interpolate_polyline_native
            if available():
                return interpolate_polyline_native(
                    np.asarray(points, np.float64), np.asarray(headings, np.float64),
                    distance, split_distance)
        except Exception:
            pass
    points = np.asarray(points, np.float64)
    headings = np.asarray(headings, np.float64)

    # 1. break into continuous pieces (preprocess.py:60-80)
    dist_lists: List[List[float]] = [[0.0]]
    poly_lists: List[List[np.ndarray]] = [[points[0]]]
    for i in range(1, points.shape[0]):
        d = float(np.linalg.norm(points[i, :2] - points[i - 1, :2]))
        hi, hj = headings[i], headings[i - 1]
        # reference quirk: uses heading[1] in the min() term (preprocess.py:64-65)
        h1 = headings[1] if headings.shape[0] > 1 else headings[0]
        diff = min(abs(max(hi, hj) - min(h1, hj)), abs(max(hi, hj) - min(h1, hj) + math.pi))
        if (diff > 0.1 and d > 3) or d > 10:
            dist_lists.append([0.0])
            poly_lists.append([points[i]])
        else:
            dist_lists[-1].append(dist_lists[-1][-1] + d)
            poly_lists[-1].append(points[i])

    polyline_size = int(split_distance / distance)  # 10
    segments = []
    for dlist, plist in zip(dist_lists, poly_lists):
        if len(dlist) < 2:
            continue
        s = np.asarray(dlist)
        pts = np.asarray(plist)
        new_s = np.concatenate([np.arange(0, s[-1], distance), s[[-1]]])
        new_x = np.interp(new_s, s, pts[:, 0])
        new_y = np.interp(new_s, s, pts[:, 1])
        poly = np.stack([new_x, new_y], axis=-1)

        n = poly.shape[0]
        if n >= polyline_size + 1:
            padding_size = (n - (polyline_size + 1)) % polyline_size
            final_index = (n - (polyline_size + 1)) // polyline_size + 1
        else:
            padding_size = n
            final_index = 0

        theta = np.arctan2(np.diff(poly[:, 1]), np.diff(poly[:, 0]))
        theta = np.concatenate([theta, theta[-1:]])
        poly3 = np.concatenate([poly, theta[:, None]], axis=-1)  # [n, 3]

        chunks = None
        if n >= polyline_size + 1:
            starts = np.arange(final_index) * polyline_size
            chunks = np.stack([poly3[st:st + polyline_size + 1] for st in starts])
            chunks = chunks[:, ::5, :]  # 11 points -> 3 sample points
        if padding_size >= 3:
            tail = poly3[final_index * polyline_size:]
            sel = np.linspace(0, tail.shape[0] - 1, 3).astype(int)
            tail3 = tail[sel][None]
            chunks = tail3 if chunks is None else np.concatenate([chunks, tail3])
        if chunks is not None:
            segments.append(chunks)

    if not segments:
        return None
    return np.concatenate(segments, axis=0)


def tokenize_map_polylines(polylines: List[Dict]) -> Dict[str, np.ndarray]:
    """Split raw map polylines into pt-token segments (host side).

    Each entry of `polylines`: dict with keys
      points [n, 2], headings [n], pt_type int, side int, pl_type int,
      pl_id int, light int.
    Returns per-token arrays incl. 3-sample-point geometry for matching.
    Mirrors TokenProcessor._tokenize_map (preprocess.py:693-760).
    """
    traj, pt_type, side, pl_type, pl_id, light = [], [], [], [], [], []
    chain_id, chain_pos = [], []
    next_chain = 0
    for pl in polylines:
        segs = interpolate_polyline(pl["points"], pl["headings"])
        if segs is None:
            continue
        n = segs.shape[0]
        traj.append(segs)
        pt_type += [pl["pt_type"]] * n
        side += [pl.get("side", 0)] * n
        pl_type += [pl.get("pl_type", 0)] * n
        pl_id += [pl.get("pl_id", next_chain)] * n
        light += [pl.get("light", 0)] * n
        chain_id += [next_chain] * n
        chain_pos += list(range(n))
        next_chain += 1

    if not traj:
        traj_arr = np.zeros((0, 3, 3), np.float32)
    else:
        traj_arr = np.concatenate(traj).astype(np.float32)
    return dict(
        traj_pos=traj_arr[:, :, :2],
        traj_theta=traj_arr[:, 0, 2],
        pt_type=np.asarray(pt_type, np.int32),
        pt_side=np.asarray(side, np.int32),
        pl_type=np.asarray(pl_type, np.int32),
        pl_id=np.asarray(pl_id, np.int32),
        light_type=np.asarray(light, np.int32),
        chain_id=np.asarray(chain_id, np.int32),
        chain_pos=np.asarray(chain_pos, np.int32),
    )


class MapTokenizer:
    """Match pt-token segments against the 1024-entry map vocab.

    Reference: InfGen.match_token_map (model/infgen.py:918-942) — rotate each
    3-point segment into its local frame and argmin L2 distance to the vocab's
    3 sample points; training adds top-8 noise sampling.
    """

    def __init__(self, vocab=None):
        self.vocab = vocab if vocab is not None else load_map_vocab()
        self.sample_pt = self.vocab["sample_pt"]  # [1024, 3, 2]

    def match(self, traj_pos, traj_theta, rng=None, noise_topk: int = 8):
        """traj_pos: [N, 3, 2]; traj_theta: [N]. Returns token ids [N] int32.

        With `rng`, samples uniformly among the top-`noise_topk` matches
        (training-time noise, model/infgen.py:939-942).
        """
        if rng is None:
            # host-side numpy path (offline preprocessing; avoids eager device
            # dispatch which is costly on remote TPU backends)
            tp = np.asarray(traj_pos, np.float32)
            th = np.asarray(traj_theta, np.float32)
            cos, sin = np.cos(th), np.sin(th)
            rot = np.stack([np.stack([cos, -sin], -1), np.stack([sin, cos], -1)], -2)
            local = np.einsum("npi,nij->npj", tp - tp[:, 0:1], rot)
            sp = np.asarray(self.sample_pt)
            d2 = ((sp[None] - local[:, None]) ** 2).sum((-2, -1))
            return d2.argmin(axis=-1).astype(np.int32)
        traj_pos = jnp.asarray(traj_pos, jnp.float32)
        traj_theta = jnp.asarray(traj_theta, jnp.float32)
        cos, sin = jnp.cos(traj_theta), jnp.sin(traj_theta)
        # rotate world->local: x @ [[c, -s], [s, c]] rotates row vectors by -theta
        rot = jnp.stack([jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2)
        local = jnp.einsum("npi,nij->npj", traj_pos - traj_pos[:, 0:1], rot)
        d2 = ((jnp.asarray(self.sample_pt)[None] - local[:, None]) ** 2).sum((-2, -1))
        _, topk = jax.lax.top_k(-d2, noise_topk)
        choice = jax.random.randint(rng, (traj_pos.shape[0],), 0, noise_topk)
        return jnp.take_along_axis(topk, choice[:, None], axis=1)[:, 0].astype(jnp.int32)


def sample_pt_pred_masks(chain_id, chain_pos, mask, rng: np.random.Generator):
    """Random masked-map-token prediction masks (host side).

    Port of InfGen.sample_pt_pred (model/infgen.py:986-1006): mask ~1/3 of
    non-initial tokens per chain; a token is a prediction site if the next
    chain position was masked; the target is that next token.
    Returns (pt_valid_mask, pt_pred_mask, pt_target_mask), all [P] bool.
    """
    P = chain_id.shape[0]
    valid = mask.copy()
    pred = np.zeros(P, bool)
    target = np.zeros(P, bool)
    for c in np.unique(chain_id[mask]):
        if c < 0:
            continue
        idx = np.nonzero((chain_id == c) & mask)[0]
        order = idx[np.argsort(chain_pos[idx])]
        n = order.shape[0]
        if n < 2:
            continue
        n_mask = max((n - 1) // 3, 1) if n > 1 else 0
        masked = rng.choice(np.arange(1, n), size=min(n_mask, n - 1), replace=False)
        valid[order[masked]] = False
        # prediction site = unmasked token right before a masked one;
        # target = that masked successor (pred/target are rolls of each other)
        is_masked = np.zeros(n, bool)
        is_masked[masked] = True
        chain_pred = np.zeros(n, bool)
        chain_pred[:-1] = is_masked[1:] & ~is_masked[:-1]
        pred[order] = chain_pred
        target[order[1:]] = chain_pred[:-1]
    return valid, pred, target
