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


def sample_next_gmm_traj(rng, token_traj, token_traj_all, ego_index,
                         ego_next_logits, ego_next_poses, ego_next_cov,
                         pos_now, head_now, pos_next_gt, head_next_gt,
                         valid_next_gt, token_agent_shape, next_token_idx,
                         criterium: str = "topk_prob", num_k: int = 5,
                         temp_mode: float = 1.0, temp_cov: float = 1.0):
    """GMM-based ego next-pose sampling (scripts/traj_clustering.py:190-295).

    Samples the ego pose from a top-k Gaussian mixture over predicted
    (x, y, heading) modes, snaps the sampled pose to the nearest vocab token
    by contour distance, and linearly interpolates the 6-step contour
    trajectory from the originally-decoded token's start contour to the
    sampled end contour. Non-ego rows pass through untouched.

    TPU-shape deviation: the reference selects ego rows with a boolean
    `ego_mask` (dynamic n_batch); here the caller passes `ego_index`
    [n_batch] integer row positions so every shape is static — results are
    scattered back with `.at[ego_index].set`.

    token_traj [A, V, 4, 2] local end contours; token_traj_all
    [A, V, 6, 4, 2]; ego_next_logits [n_batch, K_gmm]; ego_next_poses
    [n_batch, K_gmm, 3] (x, y, heading) in the ego's local frame;
    ego_next_cov [2] (position / heading std, reference :278-282 — applied
    as the Normal scale over [x, y, cos h, sin h]).
    Returns (next_token_idx [A], next_token_traj_all [A, 6, 4, 2]).
    """
    next_token_idx = jnp.asarray(next_token_idx)
    next_traj_all = jnp.take_along_axis(
        jnp.asarray(token_traj_all),
        next_token_idx[:, None, None, None, None], axis=1)[:, 0]

    if criterium not in ("topk_prob", "topk_prob_sampled_with_dist"):
        raise ValueError(f"Invalid criterium: {criterium}")

    topk_logits, topk_idx = jax.lax.top_k(ego_next_logits, num_k)
    ego_pose_topk = jnp.take_along_axis(
        ego_next_poses, topk_idx[..., None], axis=1)       # [n_batch, k, 3]

    pos_e, head_e = pos_now[ego_index], head_now[ego_index]
    shape_e = token_agent_shape[ego_index]                 # [n_batch, 2]
    if criterium == "topk_prob_sampled_with_dist":
        # global-frame contour distance of each mode to the GT box (:233-263)
        gt_contour = cal_polygon_contour(
            pos_next_gt[ego_index], head_next_gt[ego_index], shape_e)[:, None]
        rot = rot_mat_2d(head_e)                           # [n_batch, 2, 2]
        pos_g = jnp.einsum("akj,ajl->akl", ego_pose_topk[..., :2], rot) \
            + pos_e[:, None]
        head_g = ego_pose_topk[..., 2] + head_e[:, None]
        mode_contour = cal_polygon_contour(pos_g, head_g, shape_e[:, None])
        dist = jnp.linalg.norm(mode_contour - gt_contour, axis=-1).mean(-1)
        v = valid_next_gt[ego_index][:, None]
        topk_logits = jnp.where(v, 0.0, topk_logits) - jnp.where(v, dist, 0.0)

    topk_logits = topk_logits / temp_mode
    # mixture over [x, y, cos h, sin h] with per-pair stds (:268-287)
    mean4 = jnp.concatenate([
        ego_pose_topk[..., :2],
        jnp.cos(ego_pose_topk[..., 2:3]),
        jnp.sin(ego_pose_topk[..., 2:3]),
    ], axis=-1)                                            # [n_batch, k, 4]
    scale4 = jnp.repeat(jnp.asarray(ego_next_cov) * temp_cov, 2)[None, None]
    r_comp, r_norm = jax.random.split(rng)
    comp = jax.random.categorical(r_comp, topk_logits, axis=-1)  # [n_batch]
    mean_sel = jnp.take_along_axis(mean4, comp[:, None, None], axis=1)[:, 0]
    noise = jax.random.normal(r_norm, mean_sel.shape)
    ego_sample = mean_sel + scale4[0] * noise               # [n_batch, 4]

    # snap to nearest vocab token by local contour distance (:289-296)
    sample_head = jnp.arctan2(ego_sample[:, 3], ego_sample[:, 2])
    sample_contour = cal_polygon_contour(ego_sample[:, :2], sample_head,
                                         shape_e)          # [n_batch, 4, 2]
    tok_dist = jnp.linalg.norm(
        sample_contour[:, None] - token_traj[ego_index], axis=-1).mean(-1)
    ego_token = jnp.argmin(tok_dist, axis=-1).astype(next_token_idx.dtype)
    next_token_idx = next_token_idx.at[ego_index].set(ego_token)

    # interpolate the 6-step contour trajectory from the original token's
    # start contour to the sampled contour (:298-306)
    n_step = token_traj_all.shape[2]
    start = next_traj_all[ego_index][:, 0]                  # [n_batch, 4, 2]
    frac = jnp.arange(n_step, dtype=start.dtype) / (n_step - 1)
    interp = start[:, None] + (sample_contour - start)[:, None] * \
        frac[None, :, None, None]
    next_traj_all = next_traj_all.at[ego_index].set(interp)
    return next_token_idx, next_traj_all
