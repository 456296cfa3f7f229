"""On-device sampling matching the reference's beam-multinomial semantics,
plus the CatK-derived guided samplers (scripts/traj_clustering.py:107-187)."""

import jax
import jax.numpy as jnp

from infgen_tpu.utils.geometry import cal_polygon_contour, rot_mat_2d


def sample_from_topk(rng, probs, k: int):
    """Top-k then multinomial over the k renormalized probabilities.

    probs: [..., V] (need not be normalized). Returns sampled indices [...].
    Reference: motion top-5 multinomial (agent_decoder.py:2163,2194) and
    insertion grid top-10 multinomial (agent_decoder.py:1902-1904).
    """
    topk_p, topk_idx = jax.lax.top_k(probs, k)
    # categorical over the unnormalized top-k (multinomial renormalizes)
    choice = jax.random.categorical(rng, jnp.log(jnp.maximum(topk_p, 1e-30)), axis=-1)
    return jnp.take_along_axis(topk_idx, choice[..., None], axis=-1)[..., 0]


def sample_next_token_traj(rng, token_traj, token_traj_all, next_token_logits,
                           pos_now, head_now, pos_next_gt, head_next_gt,
                           valid_next_gt, token_agent_shape,
                           criterium: str = "topk_prob", num_k: int = 5,
                           temp: float = 1.0):
    """Guided next-token sampling (CatK; scripts/traj_clustering.py:107-187).

    criterium:
      topk_prob                  - standard top-k + tempered categorical
      topk_prob_sampled_with_dist- top-k by prob, logits replaced by negative
                                   contour distance to GT where GT is valid
      topk_dist_sampled_with_prob- top-k by GT distance, sample by model prob
    token_traj [A, V, 4, 2] local contours; token_traj_all [A, V, 6, 4, 2].
    Returns (next_token_idx [A], next_token_traj_all [A, 6, 4, 2]).
    """
    A = next_token_logits.shape[0]
    logits = jax.lax.stop_gradient(next_token_logits)
    rot = rot_mat_2d(head_now)                                   # [A, 2, 2]

    def world_contours(local):
        w = jnp.einsum("avcj,ajk->avck", local, rot)
        return w + pos_now[:, None, None, :]

    if criterium in ("topk_prob", "topk_prob_sampled_with_dist"):
        topk_logits, topk_idx = jax.lax.top_k(logits, num_k)
        if criterium == "topk_prob_sampled_with_dist":
            gt_contour = cal_polygon_contour(pos_next_gt, head_next_gt,
                                             token_agent_shape)[:, None]
            sel = jnp.take_along_axis(
                token_traj, topk_idx[:, :, None, None], axis=1)
            dist = jnp.linalg.norm(world_contours(sel) - gt_contour,
                                   axis=-1).mean(-1)             # [A, K]
            v = valid_next_gt[:, None]
            topk_logits = jnp.where(v, 0.0, topk_logits) - jnp.where(v, dist, 0.0)
    elif criterium == "topk_dist_sampled_with_prob":
        gt_contour = cal_polygon_contour(pos_next_gt, head_next_gt,
                                         token_agent_shape)[:, None]
        dist = jnp.linalg.norm(world_contours(token_traj) - gt_contour,
                               axis=-1).mean(-1)                 # [A, V]
        guided = jnp.where(valid_next_gt[:, None], -dist, logits)
        _, topk_idx = jax.lax.top_k(guided, num_k)
        topk_logits = jnp.take_along_axis(logits, topk_idx, axis=1)
    else:
        raise ValueError(f"Invalid criterium: {criterium}")

    choice = jax.random.categorical(rng, topk_logits / temp, axis=-1)
    next_token_idx = jnp.take_along_axis(topk_idx, choice[:, None], axis=1)[:, 0]
    traj = jnp.take_along_axis(
        token_traj_all, next_token_idx[:, None, None, None, None], axis=1)[:, 0]
    return next_token_idx, traj
