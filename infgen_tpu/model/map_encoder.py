"""Map ("pt token") encoder.

Port of InfGenMapDecoder (infgen/modules/map_decoder.py:13-130): map-vocab
token embeddings + categorical embeddings, N layers of neighbor attention
with relative-geometry bias, and a masked next-map-token prediction head.

TPU change: the pt2pt radius graph (radius 10 m, <=100 neighbors) becomes a
fixed-k nearest-neighbor table (k=32; at 5 m token spacing a 10 m disc holds
far fewer than 32 tokens, so this is a superset of the reference's edges).
"""

import jax.numpy as jnp
from flax import linen as nn

from infgen_tpu.config import Config
from infgen_tpu.model.layers import EMB_INIT, DenseAttention, FourierEmbedding, MLPEmbedding, MLPLayer
from infgen_tpu.ops.neighbors import topk_neighbors
from infgen_tpu.utils.geometry import angle_between_2d_vectors, wrap_angle

PT2PT_K = 32


class MapEncoder(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, map_data, map_vocab_traj, pt_valid_mask=None,
                 pt_pred_mask=None, deterministic: bool = True):
        """Encode map tokens.

        map_data: MapData (fields [P, ...]); map_vocab_traj: [V_map, 11, 2].
        pt_valid_mask: visibility mask for masked-token pretraining (defaults
        to map_data.mask). Returns dict with x_pt [P, D] and next-token logits.
        """
        from infgen_tpu.ops.precision import compute_dtype_of

        cfg = self.cfg
        D = cfg.hidden_dim
        dt = compute_dtype_of(cfg.compute_dtype)
        pos = map_data.position          # [P, 2]
        orient = map_data.orientation    # [P]
        mask = map_data.mask
        if pt_valid_mask is None:
            pt_valid_mask = mask

        # token embedding from raw vocab geometry (map_decoder.py:58-62,79-81)
        vocab_flat = map_vocab_traj.reshape(map_vocab_traj.shape[0], -1)  # [V, 22]
        token_emb_src = MLPEmbedding(D, name="token_emb", dtype=dt)(vocab_flat)
        x_pt = token_emb_src[map_data.token_idx]

        type_emb = nn.Embed(17, D, embedding_init=EMB_INIT, name="type_pt_emb",
                            dtype=dt)(map_data.pt_type)
        pl_emb = nn.Embed(4, D, embedding_init=EMB_INIT, name="polygon_type_emb",
                          dtype=dt)(map_data.pl_type)
        light_emb = nn.Embed(4, D, embedding_init=EMB_INIT, name="light_pl_emb",
                             dtype=dt)(map_data.light_type)
        x_pt = x_pt + type_emb + pl_emb + light_emb

        # neighbor table (radius graph equivalent), masked to visible tokens
        nbr_idx, nbr_valid = topk_neighbors(
            pos, pos, PT2PT_K, cfg.pl2pl_radius,
            query_mask=pt_valid_mask, key_mask=pt_valid_mask, exclude_self=True,
        )

        rel_pos = pos[nbr_idx] - pos[:, None]                     # [P, k, 2]
        rel_orient = wrap_angle(orient[nbr_idx] - orient[:, None])
        orient_vec = jnp.stack([jnp.cos(orient), jnp.sin(orient)], axis=-1)
        r = jnp.stack([
            jnp.linalg.norm(rel_pos, axis=-1),
            angle_between_2d_vectors(orient_vec[:, None], rel_pos),
            rel_orient,
        ], axis=-1)
        r = FourierEmbedding(3, D, cfg.num_freq_bands, name="r_pt2pt_emb",
                             dtype=dt)(r)

        # gathered-neighbor attention: per query, Q=1 against its k keys
        att_cls = (nn.remat(DenseAttention, static_argnums=(5,))
                   if cfg.remat_attention else DenseAttention)
        for i in range(cfg.num_map_layers):
            x_src = x_pt[nbr_idx]  # [P, k, D]
            x_pt = att_cls(
                D, cfg.num_heads, cfg.head_dim, cfg.dropout,
                bipartite=False, has_pos_emb=True, name=f"pt2pt_{i}",
                use_pallas=cfg.use_pallas_attention, dtype=dt,
            )(x_pt[:, None, :], x_src, r[:, None, :, :], nbr_valid[:, None, :],
              deterministic)[:, 0, :]

        logits = MLPLayer(D, cfg.map_token_size, name="token_predict_head")(x_pt)

        return {
            "x_pt": x_pt,
            "map_next_token_logits": logits,
        }
