"""Loss assembly for one scenario.

Port of the reference training_step loss block (model/infgen.py:326-564) with
torch's masked-select means expressed as masked reductions (empty masks give 0,
mirroring the reference's nan_to_num guards at :391-427).
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from infgen_tpu.config import Config, ENTER_STATE as ENTER_STATE_
from infgen_tpu.train.targets import roll_targets, seed_targets, token_state_eval_masks


def masked_ce(logits, labels, mask, label_smoothing=0.0, class_weights=None):
    """CrossEntropyLoss over masked entries; weighted mean like torch
    (sum(w_y * ce) / sum(w_y))."""
    logits = logits.astype(jnp.float32)  # loss math stays fp32 under bf16
    num_classes = logits.shape[-1]
    labels_c = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_c[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    w = mask.astype(logits.dtype)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, logits.dtype)[labels_c]
        w = w * cw
    denom = w.sum()
    return jnp.where(denom > 0, (nll * w).sum() / jnp.maximum(denom, 1e-9), 0.0)


def masked_mse(pred, target, mask):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    w = mask.astype(pred.dtype)
    if pred.ndim > mask.ndim:
        w = w[..., None]
    w = jnp.broadcast_to(w, pred.shape)
    denom = w.sum()
    se = (pred - target) ** 2 * w
    return jnp.where(denom > 0, se.sum() / jnp.maximum(denom, 1e-9), 0.0)


def masked_bce_logits(logits, target, mask, pos_weight=1.0):
    """BCEWithLogitsLoss with pos_weight, masked mean over elements."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * target * logp + (1.0 - target) * lognp)
    w = jnp.broadcast_to(mask.astype(logits.dtype), per.shape) \
        if mask.ndim == per.ndim else jnp.broadcast_to(
            mask[..., None].astype(logits.dtype), per.shape)
    denom = w.sum()
    return jnp.where(denom > 0, (per * w).sum() / jnp.maximum(denom, 1e-9), 0.0)


def compute_losses(cfg: Config, grid_size: int, pred: Dict, inputs
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    lw = cfg.loss_weight
    tok = inputs.tokens
    logs = {}
    total = 0.0

    next_token_gt, next_state_gt = roll_targets(tok.token_idx, tok.state_idx)
    tok_mask, state_mask = token_state_eval_masks(
        tok.raw_token_valid, tok.state_idx, inputs.av_index, inputs.slot_mask)

    if cfg.predict_motion:
        m = tok_mask & inputs.train_mask[:, None]
        loss = masked_ce(pred["next_token_logits"], next_token_gt, m,
                         label_smoothing=0.1) * lw.token_cls_loss
        logs["token_cls_loss"] = loss
        total += loss

        # stepwise breakdown s0..s9 after agent entry (model/infgen.py:344-355)
        A, T = tok.state_idx.shape
        is_bos = tok.state_idx == ENTER_STATE_
        bos = jnp.where(is_bos.any(1), jnp.argmax(is_bos, 1), T)
        t_idx = jnp.arange(T)[None]
        for i in range(10):
            at_i = (t_idx == (bos + 1 + i)[:, None]) & (t_idx < T - 1)
            logs[f"s{i}"] = masked_ce(pred["next_token_logits"], next_token_gt,
                                      m & at_i, label_smoothing=0.1)

    if cfg.predict_state:
        loss = masked_ce(pred["next_state_logits"], next_state_gt, state_mask,
                         class_weights=lw.state_weight) * lw.state_cls_loss
        logs["state_cls_loss"] = loss
        total += loss

        st = seed_targets(inputs, grid_size, cfg.num_seed_feature)
        l_sst = masked_ce(pred["seed_state_logits"], st["seed_state_gt"],
                          st["seed_state_mask"],
                          class_weights=lw.seed_state_weight) * lw.state_cls_loss
        l_typ = masked_ce(pred["seed_type_logits"], st["seed_type_gt"],
                          st["seed_attr_mask"],
                          class_weights=lw.seed_type_weight) * lw.type_cls_loss
        l_shp = masked_mse(pred["seed_shape"], st["seed_shape_gt"],
                           st["seed_attr_mask"]) * lw.shape_reg_loss
        logs["seed_state_cls_loss"] = l_sst
        logs["seed_type_cls_loss"] = l_typ
        logs["seed_shape_reg_loss"] = l_shp
        total += l_sst + l_typ + l_shp

        if cfg.use_grid_token:
            l_pos = masked_ce(pred["seed_pos_logits"], st["seed_pos_idx_gt"],
                              st["seed_attr_mask"],
                              label_smoothing=0.1) * lw.pos_cls_loss
            l_off = masked_mse(pred["offset_xy"], inputs.grid_offset_xy,
                               pred["mask_sa"]) * lw.offset_reg_loss
            logs["seed_pos_cls_loss"] = l_pos
            logs["seed_offset_reg_loss"] = l_off
            total += l_pos + l_off
        else:
            l_pos = masked_mse(pred["seed_pos_xy"],
                               st["seed_pos_xy_gt"] / cfg.pl2seed_radius,
                               st["seed_attr_mask"]) * lw.pos_reg_loss
            logs["seed_pos_reg_loss"] = l_pos
            total += l_pos

        if cfg.use_head_token:
            l_head = masked_ce(pred["head_logits"], inputs.heading_token_idx,
                               pred["mask_sa"]) * lw.head_cls_loss
            logs["seed_head_cls_loss"] = l_head
            total += l_head
        else:
            import math
            l_head = masked_mse(pred["head_theta"],
                                inputs.heading_theta / math.pi,
                                pred["mask_sa"]) * lw.head_reg_loss
            logs["seed_head_reg_loss"] = l_head
            total += l_head

    if cfg.predict_occ and pred["occ_agent_logits"] is not None:
        S, T, G = pred["occ_agent_logits"].shape
        occ_mask = jnp.ones((S, T, G), bool)
        occ_mask = occ_mask.at[:, 0].set(False)
        occ_mask = occ_mask.at[..., grid_size // 2].set(False)
        l_aocc = masked_bce_logits(pred["occ_agent_logits"], pred["occ_agent_gt"],
                                   occ_mask,
                                   pos_weight=lw.agent_occ_pos_weight) * lw.agent_occ_loss
        l_pocc = masked_bce_logits(pred["occ_pt_logits"], pred["occ_pt_gt"],
                                   occ_mask,
                                   pos_weight=lw.pt_occ_pos_weight) * lw.pt_occ_loss
        logs["agent_occ_loss"] = l_aocc
        logs["pt_occ_loss"] = l_pocc
        total += l_aocc + l_pocc

    if cfg.predict_map:
        l_map = masked_ce(pred["map_next_token_logits"], inputs.pt_next_token_idx,
                          inputs.pt_pred_mask & (inputs.pt_next_token_idx >= 0),
                          label_smoothing=0.1) * lw.map_token_loss
        logs["map_token_loss"] = l_map
        total += l_map

    logs["loss"] = total
    return total, logs
