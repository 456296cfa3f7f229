"""Training/validation scalar metrics.

Ports of infgen/utils/metrics.py (TokenCls:316, minADE:430, minFDE:367,
StateAccuracy:485, GridOverlapRate:562) as stateless jnp functions returning
(sum, count) pairs; accumulate across batches/hosts with `jax.lax.psum` or
plain addition — the torchmetrics dist_reduce_fx='sum' equivalent.
"""

from typing import Dict

import jax.numpy as jnp

from infgen_tpu.config import ENTER_STATE, EXIT_STATE, INVALID_STATE, VALID_STATE


def token_cls_accuracy(pred_topk, target, valid_mask, max_guesses: int = 1):
    """pred_topk [..., K] token ids; target [...]; TokenCls (utils/metrics.py:316)."""
    hit = (pred_topk[..., :max_guesses] == target[..., None]).any(-1) & valid_mask
    return hit.sum(), valid_mask.sum()


def min_ade(pred, target, valid_mask, eval_timestep: int = 70):
    """minADE with the reference's normalization quirk (divides by the full
    horizon length, utils/metrics.py:461-463)."""
    t = min(eval_timestep, pred.shape[1])
    err = jnp.linalg.norm(pred[:, :t] - target[:, :t], axis=-1) * valid_mask[:, :t]
    per_agent = err.sum(-1) / pred.shape[1]
    count = valid_mask[:, :t].any(-1)
    return (per_agent * count).sum(), count.sum()


def min_fde(pred, target, valid_mask, eval_timestep: int = 70):
    """minFDE evaluated at index min(eval_timestep, T) - 2, matching the
    reference's own double offset (utils/metrics.py:384-387: eval_timestep =
    min(70, T) - 1, then pred[:, eval_timestep-1]). The apparent off-by-one
    is the reference's actual behavior, reproduced deliberately."""
    t = min(eval_timestep, pred.shape[1]) - 1
    err = jnp.linalg.norm(pred[:, t - 1] - target[:, t - 1], axis=-1)
    m = valid_mask[:, t - 1]
    return (err * m).sum(), m.sum()


def state_accuracy(state_idx) -> Dict[str, jnp.ndarray]:
    """Within-lifecycle state correctness (utils/metrics.py:485-550, eval part).

    valid: fraction of steps strictly inside (bos, eos) predicted `valid`;
    invalid: fraction of steps outside [bos, eos] predicted `invalid`.
    """
    A, T = state_idx.shape
    is_bos = state_idx == ENTER_STATE
    is_eos = state_idx == EXIT_STATE
    has_bos = is_bos.any(-1)
    has_eos = is_eos.any(-1)
    bos = jnp.where(has_bos, jnp.argmax(is_bos, -1), 0)
    eos = jnp.where(has_eos, jnp.argmax(is_eos, -1), T - 1)
    t = jnp.arange(T)[None]

    # padded / fully-invalid slots don't exist in the reference's agent set
    exists = (state_idx != INVALID_STATE).any(-1)[:, None]
    before = has_bos[:, None] & (t < bos[:, None]) & exists
    after = has_eos[:, None] & (t > eos[:, None]) & exists
    inside = (t > bos[:, None]) & (t < eos[:, None]) & exists

    inv_ok = ((state_idx == INVALID_STATE) & (before | after)).sum()
    inv_cnt = (before | after).sum()
    val_ok = ((state_idx == VALID_STATE) & inside).sum()
    val_cnt = inside.sum()
    return dict(valid_sum=val_ok, valid_count=val_cnt,
                invalid_sum=inv_ok, invalid_count=inv_cnt)


def grid_overlap_rate(state_token, grid_index, grid_size: int,
                      seed_size: int = 10) -> Dict[str, jnp.ndarray]:
    """Insertion-grid collision diagnostics (utils/metrics.py:562-616).

    Per step: how many entering agents landed on an already-occupied cell.
    """
    A, T = state_token.shape
    inrange = grid_index != -1
    entering = (state_token == ENTER_STATE) & inrange
    occupied_src = inrange & (state_token != ENTER_STATE)

    import jax
    gi = jnp.where(inrange, grid_index, 0)
    occ_onehot = (jax.nn.one_hot(gi, grid_size, dtype=jnp.int32) *
                  occupied_src[..., None]).sum(0) > 0        # [T, G]
    # sequential pop order doesn't matter for the count when duplicates among
    # entering agents also collide: count each entering agent whose cell is
    # occupied by a non-entering agent OR by an earlier entering agent
    enter_onehot = jax.nn.one_hot(gi, grid_size, dtype=jnp.int32) * entering[..., None]
    enter_counts = enter_onehot.sum(0)                       # [T, G]
    dup_overlaps = jnp.maximum(enter_counts - 1, 0).sum(-1)  # among entering
    occ_overlaps = ((enter_counts > 0) & occ_onehot).sum(-1)
    num_overlap_t = dup_overlaps + occ_overlaps
    return dict(
        num_overlap_t=num_overlap_t,
        num_insert_agent_t=entering.sum(0),
        num_total_agent_t=inrange.sum(0),
        num_exceed_seed_t=(entering.sum(0) >= seed_size).astype(jnp.int32),
    )


def min_multi_ade(pred_k, target, valid_mask, min_criterion: str = "FDE"):
    """minADE over K guesses (utils/metrics.py:394-428 minMultiADE).

    pred_k [A, K, T, 2]; target [A, T, 2]; valid_mask [A, T].
    """
    A, K, T, _ = pred_k.shape
    err = jnp.linalg.norm(pred_k - target[:, None], axis=-1)      # [A, K, T]
    if min_criterion == "FDE":
        last = (valid_mask * jnp.arange(1, T + 1)).argmax(-1)     # [A]
        fde = jnp.take_along_axis(err, last[:, None, None], 2)[..., 0]
        best = fde.argmin(-1)                                     # [A]
        err_best = jnp.take_along_axis(err, best[:, None, None], 1)[:, 0]
        ade = (err_best * valid_mask).sum(-1) / jnp.maximum(valid_mask.sum(-1), 1)
    else:
        ade_k = (err * valid_mask[:, None]).sum(-1) / jnp.maximum(
            valid_mask.sum(-1), 1)[:, None]
        ade = ade_k.min(-1)
    has = valid_mask.any(-1)
    return (ade * has).sum(), has.sum()


def min_multi_fde(pred_k, target, valid_mask):
    """minFDE over K guesses (utils/metrics.py:340-365 minMultiFDE)."""
    A, K, T, _ = pred_k.shape
    last = (valid_mask * jnp.arange(1, T + 1)).argmax(-1)
    pred_last = jnp.take_along_axis(pred_k, last[:, None, None, None], 2)[:, :, 0]
    tgt_last = jnp.take_along_axis(target, last[:, None, None], 1)[:, 0]
    fde = jnp.linalg.norm(pred_last - tgt_last[:, None], axis=-1).min(-1)
    has = valid_mask.any(-1)
    return (fde * has).sum(), has.sum()


def num_insert_accuracy(pred_state, gt_state):
    """Per-step inserted-agent-count agreement (utils/metrics.py:618-692
    NumInsertAccuracy): |#enter_pred - #enter_gt| summed over steps."""
    pe = (pred_state == ENTER_STATE).sum(0)
    ge = (gt_state == ENTER_STATE).sum(0)
    return jnp.abs(pe - ge).sum(), jnp.maximum(ge.sum(), 1)
