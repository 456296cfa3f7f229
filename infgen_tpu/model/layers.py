"""Core NN layers (flax.linen), TPU-first.

The reference's edge-list `AttentionLayer` (MessagePassing with scatter
softmax, infgen/modules/layers.py:16-113) becomes `DenseAttention`: dense
multi-head attention over padded neighbor axes with boolean masks and an
optional per-(query,key) relative-geometry embedding that biases K and V.
Scenarios have <=128 agents and the reference's neighbor caps (300) never
truncate below that, so dense masked attention is semantically equivalent and
maps straight onto the MXU instead of scatter/gather units TPUs don't have.
"""

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

# Match the reference init zoo (utils/func.py:177-208): xavier-uniform linear
# weights, zero biases, N(0, 0.02) embeddings.
XAVIER = nn.initializers.xavier_uniform()
EMB_INIT = nn.initializers.normal(stddev=0.02)


def _dense(features, use_bias=True, name=None):
    return nn.Dense(features, use_bias=use_bias, kernel_init=XAVIER, name=name)


class MLPLayer(nn.Module):
    """Linear -> LN -> ReLU -> Linear. Reference: layers.py:195-215."""

    hidden_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        return _dense(self.output_dim)(x)


class MLPEmbedding(nn.Module):
    """3-layer embedding MLP. Reference: layers.py:163-192."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        x = _dense(128)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = _dense(self.hidden_dim)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        return _dense(self.hidden_dim)(x)


class FourierEmbedding(nn.Module):
    """Learnable sinusoidal embedding per continuous input channel.

    Reference: layers.py:116-160. Input [..., input_dim] -> [..., hidden_dim].
    """

    input_dim: int
    hidden_dim: int
    num_freq_bands: int

    @nn.compact
    def __call__(self, x, categorical_embs: Optional[list] = None):
        if x is not None:
            freqs = self.param("freqs", EMB_INIT, (self.input_dim, self.num_freq_bands))
            xf = x[..., None] * freqs * 2 * math.pi  # [..., input_dim, F]
            feat = jnp.concatenate([jnp.cos(xf), jnp.sin(xf), x[..., None]], axis=-1)
            outs = []
            for i in range(self.input_dim):
                h = _dense(self.hidden_dim, name=f"mlp_{i}_0")(feat[..., i, :])
                h = nn.LayerNorm(name=f"mlp_{i}_ln")(h)
                h = nn.relu(h)
                h = _dense(self.hidden_dim, name=f"mlp_{i}_1")(h)
                outs.append(h)
            out = sum(outs)
            if categorical_embs is not None:
                out = out + sum(categorical_embs)
        else:
            out = sum(categorical_embs)
        out = nn.LayerNorm(name="out_ln")(out)
        out = nn.relu(out)
        return _dense(self.hidden_dim, name="out_dense")(out)


class DenseAttention(nn.Module):
    """Masked dense attention with gated update and FFN.

    Semantics match the reference AttentionLayer (layers.py:16-113) evaluated
    over a dense padded key axis:
      - pre-LN on src/dst (shared when not bipartite)
      - K/V biased by a relative-geometry embedding r per (query, key) pair
      - masked softmax over keys; fully-masked queries aggregate to zero
        (scatter-add over zero edges in the reference)
      - gated update: out = agg + sigmoid(g([agg, x_dst])) * (to_s(x_dst) - agg)
      - residual + post-LN, then pre-LN FFN with residual + post-LN.

    Shapes: x_dst [..., Q, D]; x_src [..., K, D]; r [..., Q, K, D] or None;
    mask [..., Q, K] bool (True = attend).
    """

    hidden_dim: int
    num_heads: int
    head_dim: int
    dropout: float = 0.0
    bipartite: bool = False
    has_pos_emb: bool = True
    use_pallas: bool = False  # fused kernel for eligible dense-square calls

    @nn.compact
    def __call__(self, x_dst, x_src=None, r=None, mask=None, deterministic=True):
        D = self.hidden_dim
        H, Hd = self.num_heads, self.head_dim
        same = x_src is None
        if same:
            x_src = x_dst

        ln_src = nn.LayerNorm(name="prenorm_src")
        src_n = ln_src(x_src)
        if self.bipartite:
            dst_n = nn.LayerNorm(name="prenorm_dst")(x_dst)
        else:
            dst_n = src_n if same else ln_src(x_dst)

        q = _dense(H * Hd, name="to_q")(dst_n)
        k = _dense(H * Hd, use_bias=False, name="to_k")(src_n)
        v = _dense(H * Hd, name="to_v")(src_n)
        q = q.reshape(*q.shape[:-1], H, Hd)
        k = k.reshape(*k.shape[:-1], H, Hd)
        v = v.reshape(*v.shape[:-1], H, Hd)

        r_per_pair = r is not None and r.ndim == x_src.ndim + 1

        # fused Pallas path: dense square attention [B, Q, D] x [B, K, D]
        # with per-pair r and a mask, no dropout active (the kernel has no
        # VJP, so gradient-taking callers keep the XLA path)
        pallas_ok = (self.use_pallas and self.has_pos_emb and r_per_pair
                     and mask is not None and x_dst.ndim == 3
                     and (deterministic or self.dropout == 0.0))
        if self.has_pos_emb:
            # raw r-projection params shared by both paths
            w_kr = self.param("w_kr", XAVIER, (D, H * Hd))
            w_vr = self.param("w_vr", XAVIER, (D, H * Hd))
            b_vr = self.param("b_vr", nn.initializers.zeros, (H * Hd,))

        if pallas_ok:
            from infgen_tpu.ops.pallas_attention import r_biased_attention

            r_n = nn.LayerNorm(name="prenorm_r")(r)
            q2 = q.reshape(*q.shape[:-2], H * Hd)
            k2 = k.reshape(*k.shape[:-2], H * Hd)
            v2 = v.reshape(*v.shape[:-2], H * Hd) + b_vr
            agg = r_biased_attention(q2, k2, v2, r_n, w_kr, w_vr, mask, H)
        else:
            # scores: q . (k + k_r). r may be per-pair [..., Q, K, D] or
            # query-independent [..., K, D] (same geometry for every query,
            # e.g. seeds that all sit on the ego position).
            sim = jnp.einsum("...qhd,...khd->...qkh", q, k)
            if self.has_pos_emb and r is not None:
                r_n = nn.LayerNorm(name="prenorm_r")(r)
                k_r = (r_n @ w_kr).reshape(*r_n.shape[:-1], H, Hd)
                v_r = (r_n @ w_vr + b_vr).reshape(*r_n.shape[:-1], H, Hd)
                if r_per_pair:
                    sim = sim + jnp.einsum("...qhd,...qkhd->...qkh", q, k_r)
                else:
                    sim = sim + jnp.einsum("...qhd,...khd->...qkh", q, k_r)
            sim = sim * (Hd ** -0.5)

            if mask is not None:
                sim = jnp.where(mask[..., None], sim, -jnp.inf)
            attn = nn.softmax(sim, axis=-2)
            if mask is not None:
                # fully-masked queries: softmax of -inf rows is NaN -> zero
                any_valid = mask.any(axis=-1)
                attn = jnp.where(any_valid[..., None, None], attn, 0.0)
                attn = jnp.where(mask[..., None], attn, 0.0)
            if self.dropout > 0.0 and not deterministic:
                attn = nn.Dropout(self.dropout, deterministic=False,
                                  name="attn_drop")(attn)

            agg = jnp.einsum("...qkh,...khd->...qhd", attn, v)
            if self.has_pos_emb and r is not None:
                if r_per_pair:
                    agg = agg + jnp.einsum("...qkh,...qkhd->...qhd", attn, v_r)
                else:
                    agg = agg + jnp.einsum("...qkh,...khd->...qhd", attn, v_r)
            agg = agg.reshape(*agg.shape[:-2], H * Hd)

        # gated update (layers.py:94-99)
        g = nn.sigmoid(_dense(H * Hd, name="to_g")(jnp.concatenate([agg, dst_n], axis=-1)))
        agg = agg + g * (_dense(H * Hd, name="to_s")(dst_n) - agg)
        attn_out = _dense(D, name="to_out")(agg)

        x = x_dst + nn.LayerNorm(name="postnorm")(attn_out)

        # FFN (layers.py:42-47,75)
        h = nn.LayerNorm(name="ff_prenorm")(x)
        h = _dense(D * 4, name="ff_0")(h)
        h = nn.relu(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False, name="ff_drop")(h)
        h = _dense(D, name="ff_1")(h)
        return x + nn.LayerNorm(name="ff_postnorm")(h)
