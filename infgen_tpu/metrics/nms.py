"""Trajectory-mode NMS helpers (reference infgen/utils/metrics.py:143-314).

Greedy farthest-goal mode selection over predicted trajectory sets:
repeatedly pick the highest-scoring mode, then suppress every mode whose
endpoint falls inside the picked mode's cover region. The reference keeps
these as MTR-style utilities next to its torchmetrics classes; they are not
called from the training/eval paths but belong to the component inventory
(SURVEY §2 row 14), so they are provided here as fixed-shape JAX ports.

All three variants share one greedy core; `num_ret_modes` is static so the
selection loop unrolls at trace time (6 tiny iterations — no `lax.scan`
overhead, everything stays on device).

Semantics matched to the reference exactly, including its bookkeeping
quirks: the suppression multiplies survivor scores by 0 rather than masking
them out, and every past selection re-contributes a -1 penalty per round
(`point_val += point_val_selected` accumulates), so ties after full
suppression resolve to the first index — same as torch argmax.
"""

from typing import Tuple

import jax.numpy as jnp


def _sort_desc(scores):
    """argsort descending, stable (torch.argsort on CPU is stable too)."""
    return jnp.argsort(-scores, axis=-1)


def _greedy_select(sorted_scores, cover_mask, num_ret_modes: int):
    """Shared greedy loop (reference utils/metrics.py:180-196,246-260,296-310).

    sorted_scores: [B, N] scores in selection order
    cover_mask:    [B, N, N] cover_mask[b, i, j] — picking i suppresses j
    Returns positions into the sorted arrays: [B, num_ret_modes].
    """
    B, N = sorted_scores.shape
    point_val = sorted_scores
    selected_pen = jnp.zeros_like(sorted_scores)
    picks = []
    b_idx = jnp.arange(B)
    for _ in range(num_ret_modes):
        cur = jnp.argmax(point_val, axis=-1)                       # [B]
        picks.append(cur)
        new_cover = cover_mask[b_idx, cur]                         # [B, N]
        point_val = point_val * (~new_cover).astype(point_val.dtype)
        selected_pen = selected_pen.at[b_idx, cur].set(-1.0)
        point_val = point_val + selected_pen
    return jnp.stack(picks, axis=1)                                # [B, K]


def _gather_rows(x, idx):
    """x[b, idx[b, k]] for arbitrary trailing dims."""
    b = jnp.arange(x.shape[0])[:, None]
    return x[b, idx]


def new_batch_nms(pred_trajs, dist_thresh: float, num_ret_modes: int = 6
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Density-scored NMS (reference utils/metrics.py:143-197).

    Scores each mode by the fraction of modes whose goals land within
    `dist_thresh` of its own goal, then greedy-selects.

    pred_trajs: [B, M, T, F] with xy in features 0:2.
    Returns (ret_trajs [B, K, T, F], ret_scores [B, K], ret_idxs [B, K]).
    """
    B, M, T, F = pred_trajs.shape
    goals = pred_trajs[:, :, -1, :]
    dist = jnp.linalg.norm(goals[:, :, None, 0:2] - goals[:, None, :, 0:2],
                           axis=-1)
    scores = (dist < dist_thresh).sum(-1) / M                      # [B, M]

    order = _sort_desc(scores)
    s_scores = _gather_rows(scores, order)
    s_trajs = _gather_rows(pred_trajs, order)
    s_goals = s_trajs[:, :, -1, :]
    cover = jnp.linalg.norm(
        s_goals[:, :, None, 0:2] - s_goals[:, None, :, 0:2], axis=-1
    ) < dist_thresh

    picks = _greedy_select(s_scores, cover, num_ret_modes)
    return (_gather_rows(s_trajs, picks), _gather_rows(s_scores, picks),
            _gather_rows(order, picks))


def batch_nms(pred_trajs, pred_scores, dist_thresh: float,
              num_ret_modes: int = 6, mode: str = "static", speed=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Score-ordered NMS (reference utils/metrics.py:200-260).

    mode="static": isotropic goal-distance cover (< dist_thresh).
    mode="speed":  anisotropic box cover (|Δx| < 4, |Δy| < 0.5) —
                   the reference hardcodes the thresholds (`speed` unused).

    pred_trajs: [B, M, T, F], pred_scores: [B, M].
    Returns (ret_trajs [B, K, T, F], ret_scores [B, K], ret_idxs [B, K]).
    """
    order = _sort_desc(pred_scores)
    s_scores = _gather_rows(pred_scores, order)
    s_trajs = _gather_rows(pred_trajs, order)
    s_goals = s_trajs[:, :, -1, :]

    if mode == "speed":
        lon = jnp.abs(s_goals[:, :, None, 0] - s_goals[:, None, :, 0])
        lat = jnp.abs(s_goals[:, :, None, 1] - s_goals[:, None, :, 1])
        cover = (lon < 4.0) & (lat < 0.5)
    else:
        dist = jnp.linalg.norm(
            s_goals[:, :, None, 0:2] - s_goals[:, None, :, 0:2], axis=-1)
        cover = dist < dist_thresh

    picks = _greedy_select(s_scores, cover, num_ret_modes)
    return (_gather_rows(s_trajs, picks), _gather_rows(s_scores, picks),
            _gather_rows(order, picks))


def batch_nms_token(pred_goals, pred_scores, dist_thresh: float,
                    num_ret_modes: int = 6, mode: str = "static", speed=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Goal-point (token) NMS (reference utils/metrics.py:263-314).

    mode="nearby": adaptive per-mode radius — the 5th-smallest pairwise goal
    distance (reference :286-290; cover excludes the threshold itself).

    pred_goals: [B, M, F] goal points with xy in features 0:2.
    Returns (ret_goals [B, K, F], ret_scores [B, K], ret_idxs [B, K]).
    """
    order = _sort_desc(pred_scores)
    s_scores = _gather_rows(pred_scores, order)
    s_goals = _gather_rows(pred_goals, order)

    dist = jnp.linalg.norm(
        s_goals[:, :, None, 0:2] - s_goals[:, None, :, 0:2], axis=-1)
    if mode == "nearby":
        k = min(5, dist.shape[-1])
        thresh = jnp.sort(dist, axis=-1)[..., k - 1]   # 5th-smallest distance
        cover = dist < thresh[..., None]
    else:
        cover = dist < dist_thresh

    picks = _greedy_select(s_scores, cover, num_ret_modes)
    return (_gather_rows(s_goals, picks), _gather_rows(s_scores, picks),
            _gather_rows(order, picks))
