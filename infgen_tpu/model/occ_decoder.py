"""Standalone occupancy-grid decoder (`decoder_type: occ_decoder`).

Port of InfGenOccDecoder (infgen/modules/occ_decoder.py:18-927, live path
:791-925): for a few randomly selected agents / map tokens per scenario,
Fourier-embed their ego-relative geometry per token step and classify the
ego-grid cell each occupies. Used by the reference's
ours_standard_decode_occ.yaml experiment as an occupancy pretraining task.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from infgen_tpu.config import Config
from infgen_tpu.model.edges import build_motion_vectors
from infgen_tpu.model.layers import FourierEmbedding, MLPLayer
from infgen_tpu.utils.geometry import angle_between_2d_vectors

AGENT_LIMIT = 3   # occ_decoder.py:113
PT_LIMIT = 10     # occ_decoder.py:114


class OccDecoder(nn.Module):
    cfg: Config
    grid_size: int

    @nn.compact
    def __call__(self, inputs, pt_pos, pt_orient, rng) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        D = cfg.hidden_dim
        tok = inputs.tokens
        pos_a = tok.token_pos                     # [A, T, 2]
        head_a = tok.token_heading
        A, T = head_a.shape
        P = pt_pos.shape[0]

        ego_pos = inputs.ego_pos                  # [T, 2]
        ego_head = inputs.ego_head
        _, head_vec = build_motion_vectors(pos_a, head_a, tok.state_idx)
        ego_hv = head_vec[inputs.av_index]        # [T, 2]

        rng_a, rng_p = jax.random.split(rng)
        sel_a = jax.random.permutation(rng_a, A)[:AGENT_LIMIT]
        sel_p = jax.random.permutation(rng_p, P)[:PT_LIMIT]

        # ego-relative descriptors (occ_decoder.py:825-860)
        rel_a = pos_a[sel_a] - ego_pos[None]                        # [k, T, 2]
        r_a2a = jnp.stack([
            jnp.linalg.norm(rel_a, axis=-1),
            angle_between_2d_vectors(ego_hv[None], rel_a),
            head_a[sel_a] - ego_head[None],
        ], axis=-1)
        r_a2a = FourierEmbedding(3, D, cfg.num_freq_bands, name="r_a2a_emb")(r_a2a)

        rel_p = pt_pos[sel_p][:, None] - ego_pos[None]              # [k, T, 2]
        r_pl2a = jnp.stack([
            jnp.linalg.norm(rel_p, axis=-1),
            angle_between_2d_vectors(ego_hv[None], rel_p),
            jnp.broadcast_to(pt_orient[sel_p][:, None], (PT_LIMIT, T)) - ego_head[None],
        ], axis=-1)
        r_pl2a = FourierEmbedding(3, D, cfg.num_freq_bands, name="r_pt2a_emb")(r_pl2a)

        # aggregate across the selected set -> per-step global feature (:869-872)
        feat_a = r_a2a.mean(axis=0)               # [T, D]
        feat_p = r_pl2a.mean(axis=0)

        agent_occ = MLPLayer(self.grid_size, AGENT_LIMIT * self.grid_size,
                             name="grid_agent_occ_head")(feat_a)
        pt_occ = MLPLayer(self.grid_size, PT_LIMIT * self.grid_size,
                          name="grid_pt_occ_head")(feat_p)
        agent_occ = agent_occ.reshape(T, AGENT_LIMIT, self.grid_size)
        pt_occ = pt_occ.reshape(T, PT_LIMIT, self.grid_size)

        agent_occ_gt = inputs.grid_token_idx[sel_a].swapaxes(0, 1)   # [T, k]
        pt_occ_gt = inputs.pt_grid_token_idx[:, sel_p]               # [T, k]

        return {
            "occ_decoder": True,
            "agent_occ": agent_occ,
            "agent_occ_gt": agent_occ_gt,
            "agent_occ_eval_mask": agent_occ_gt != -1,
            "pt_occ": pt_occ,
            "pt_occ_gt": pt_occ_gt,
            "pt_occ_eval_mask": pt_occ_gt != -1,
        }


def occ_decoder_loss(pred: Dict[str, jnp.ndarray]):
    """CE over grid cells at valid sites (model/infgen.py:275-290)."""
    from infgen_tpu.train.losses import masked_ce

    l_a = masked_ce(pred["agent_occ"], pred["agent_occ_gt"],
                    pred["agent_occ_eval_mask"])
    l_p = masked_ce(pred["pt_occ"], pred["pt_occ_gt"],
                    pred["pt_occ_eval_mask"])
    return l_a + l_p, {"agent_occ_cls_loss": l_a, "pt_occ_cls_loss": l_p,
                       "loss": l_a + l_p}
