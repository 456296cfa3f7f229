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
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

# Match the reference init zoo (utils/func.py:177-208): xavier-uniform linear
# weights, zero biases, N(0, 0.02) embeddings.
XAVIER = nn.initializers.xavier_uniform()
EMB_INIT = nn.initializers.normal(stddev=0.02)


def _dense(features, use_bias=True, name=None, dtype=None):
    """Dense with the compute-dtype policy: `dtype=bfloat16` runs the matmul
    in bf16 on the MXU while params stay fp32 masters (ops/precision.py)."""
    return nn.Dense(features, use_bias=use_bias, kernel_init=XAVIER, name=name,
                    dtype=dtype)


class MLPLayer(nn.Module):
    """Linear -> LN -> ReLU -> Linear. Reference: layers.py:195-215."""

    hidden_dim: int
    output_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        return _dense(self.output_dim, dtype=self.dtype)(x)


class MLPEmbedding(nn.Module):
    """3-layer embedding MLP. Reference: layers.py:163-192."""

    hidden_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _dense(128, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = _dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        return _dense(self.hidden_dim, dtype=self.dtype)(x)


class FourierEmbedding(nn.Module):
    """Learnable sinusoidal embedding per continuous input channel.

    Reference: layers.py:116-160. Input [..., input_dim] -> [..., hidden_dim].
    """

    input_dim: int
    hidden_dim: int
    num_freq_bands: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, categorical_embs: Optional[list] = None):
        if x is not None:
            freqs = self.param("freqs", EMB_INIT, (self.input_dim, self.num_freq_bands))
            # cos/sin of the raw (fp32) features, then compute-dtype MLPs
            xf = x[..., None] * freqs * 2 * math.pi  # [..., input_dim, F]
            feat = jnp.concatenate([jnp.cos(xf), jnp.sin(xf), x[..., None]], axis=-1)
            outs = []
            for i in range(self.input_dim):
                h = _dense(self.hidden_dim, name=f"mlp_{i}_0",
                           dtype=self.dtype)(feat[..., i, :])
                h = nn.LayerNorm(name=f"mlp_{i}_ln", dtype=self.dtype)(h)
                h = nn.relu(h)
                h = _dense(self.hidden_dim, name=f"mlp_{i}_1",
                           dtype=self.dtype)(h)
                outs.append(h)
            out = sum(outs)
            if categorical_embs is not None:
                out = out + sum(categorical_embs)
        else:
            out = sum(categorical_embs)
        out = nn.LayerNorm(name="out_ln", dtype=self.dtype)(out)
        out = nn.relu(out)
        return _dense(self.hidden_dim, name="out_dense", dtype=self.dtype)(out)


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
    dtype: Any = None

    @nn.compact
    def __call__(self, x_dst, x_src=None, r=None, mask=None, deterministic=True):
        D = self.hidden_dim
        H, Hd = self.num_heads, self.head_dim
        same = x_src is None
        if same:
            x_src = x_dst

        ln_src = nn.LayerNorm(name="prenorm_src", dtype=self.dtype)
        src_n = ln_src(x_src)
        if self.bipartite:
            dst_n = nn.LayerNorm(name="prenorm_dst", dtype=self.dtype)(x_dst)
        else:
            dst_n = src_n if same else ln_src(x_dst)

        q = _dense(H * Hd, name="to_q", dtype=self.dtype)(dst_n)
        k = _dense(H * Hd, use_bias=False, name="to_k", dtype=self.dtype)(src_n)
        v = _dense(H * Hd, name="to_v", dtype=self.dtype)(src_n)
        q = q.reshape(*q.shape[:-1], H, Hd)
        k = k.reshape(*k.shape[:-1], H, Hd)
        v = v.reshape(*v.shape[:-1], H, Hd)

        r_per_pair = r is not None and r.ndim == x_src.ndim + 1

        # fused Pallas path: dense square attention [B, Q, D] x [B, K, D]
        # with per-pair r and a mask; training runs through the custom-VJP
        # wrapper (recompute backward) with an explicit attention-dropout
        # multiplier matching torch semantics. Unbatched square calls
        # (rollout column passes, [A, D] x [A, D]) ride as B=1.
        pallas_unbatched = x_dst.ndim == 2 and x_src.ndim == 2
        pallas_ok = (self.use_pallas and self.has_pos_emb and r_per_pair
                     and mask is not None
                     and (x_dst.ndim == 3 or pallas_unbatched)
                     and x_dst.shape[-2] >= 8)  # query tiling wastes small Q
        if self.has_pos_emb:
            # raw r-projection params shared by both paths (fp32 masters,
            # cast to the compute dtype like flax Dense does)
            w_kr = self.param("w_kr", XAVIER, (D, H * Hd))
            w_vr = self.param("w_vr", XAVIER, (D, H * Hd))
            b_vr = self.param("b_vr", nn.initializers.zeros, (H * Hd,))
            if self.dtype is not None:
                w_kr = w_kr.astype(self.dtype)
                w_vr = w_vr.astype(self.dtype)
                b_vr = b_vr.astype(self.dtype)

        if pallas_ok:
            import jax

            from infgen_tpu.ops.pallas_attention import r_biased_attention_trainable

            # the kernel computes in fp32 (online softmax stability); under a
            # bf16 compute policy inputs are cast up at the boundary
            f32 = jnp.float32
            r_n = nn.LayerNorm(name="prenorm_r")(r)
            q2 = q.reshape(*q.shape[:-2], H * Hd).astype(f32)
            k2 = k.reshape(*k.shape[:-2], H * Hd).astype(f32)
            v2 = (v.reshape(*v.shape[:-2], H * Hd) + b_vr).astype(f32)
            pmask = mask
            if pallas_unbatched:
                q2, k2, v2 = q2[None], k2[None], v2[None]
                r_n, pmask = r_n[None], mask[None]
            drop = None
            if self.dropout > 0.0 and not deterministic:
                # per-head i.i.d. like nn.Dropout on [..., Q, K, H] weights
                keep = jax.random.bernoulli(self.make_rng("dropout"),
                                            1.0 - self.dropout,
                                            (*pmask.shape, H))
                drop = keep.astype(f32) / (1.0 - self.dropout)
            agg = r_biased_attention_trainable(
                q2, k2, v2, r_n.astype(f32), w_kr.astype(f32),
                w_vr.astype(f32), pmask, H, drop).astype(x_dst.dtype)
            if pallas_unbatched:
                agg = agg[0]
        else:
            # scores: q . (k + k_r). r may be per-pair [..., Q, K, D] or
            # query-independent [..., K, D] (same geometry for every query,
            # e.g. seeds that all sit on the ego position).
            # scores accumulate in fp32 (MXU-native: bf16 inputs, fp32 out)
            # so the softmax below is full precision under any compute dtype
            sim = jnp.einsum("...qhd,...khd->...qkh", q, k,
                             preferred_element_type=jnp.float32)
            if self.has_pos_emb and r is not None:
                r_n = nn.LayerNorm(name="prenorm_r", dtype=self.dtype)(r)
                k_r = (r_n @ w_kr).reshape(*r_n.shape[:-1], H, Hd)
                v_r = (r_n @ w_vr + b_vr).reshape(*r_n.shape[:-1], H, Hd)
                if r_per_pair:
                    sim = sim + jnp.einsum("...qhd,...qkhd->...qkh", q, k_r,
                                           preferred_element_type=jnp.float32)
                else:
                    sim = sim + jnp.einsum("...qhd,...khd->...qkh", q, k_r,
                                           preferred_element_type=jnp.float32)
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

            attn = attn.astype(v.dtype)  # back to compute dtype for the MXU
            agg = jnp.einsum("...qkh,...khd->...qhd", attn, v)
            if self.has_pos_emb and r is not None:
                if r_per_pair:
                    agg = agg + jnp.einsum("...qkh,...qkhd->...qhd", attn, v_r)
                else:
                    agg = agg + jnp.einsum("...qkh,...khd->...qhd", attn, v_r)
            agg = agg.reshape(*agg.shape[:-2], H * Hd)

        # gated update (layers.py:94-99)
        dt = self.dtype
        g = nn.sigmoid(_dense(H * Hd, name="to_g", dtype=dt)(
            jnp.concatenate([agg, dst_n], axis=-1)))
        agg = agg + g * (_dense(H * Hd, name="to_s", dtype=dt)(dst_n) - agg)
        attn_out = _dense(D, name="to_out", dtype=dt)(agg)

        x = x_dst + nn.LayerNorm(name="postnorm", dtype=dt)(attn_out)

        # FFN (layers.py:42-47,75)
        h = nn.LayerNorm(name="ff_prenorm", dtype=dt)(x)
        h = _dense(D * 4, name="ff_0", dtype=dt)(h)
        h = nn.relu(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False, name="ff_drop")(h)
        h = _dense(D, name="ff_1", dtype=dt)(h)
        return x + nn.LayerNorm(name="ff_postnorm", dtype=dt)(h)


def dense_attention_zero_agg(p, x, bipartite: bool = False, dtype=None):
    """Closed form of DenseAttention for a row with NO incident edges.

    With every key masked, agg == 0 exactly, so the layer reduces to
      g   = sigmoid(to_g(concat([0, dst_n])))
      agg = g * to_s(dst_n)
      out = x + postnorm(to_out(agg)); out = out + ff_postnorm(FFN(out))
    — skipping the q/k/v projections and masked-softmax machinery the module
    would execute against a dummy key (XLA cannot prove the dummy path is
    dead). `p` is the layer's param subtree; numerics match the module
    including the compute-dtype policy (verified in tests/test_model.py).
    """
    import jax

    def cast(w):
        return w.astype(dtype) if dtype is not None else w

    def ln(v, q):
        # flax LayerNorm computes statistics in fp32 regardless of dtype
        v32 = v.astype(jnp.float32)
        m = v32.mean(axis=-1, keepdims=True)
        var = ((v32 - m) ** 2).mean(axis=-1, keepdims=True)
        y = (v32 - m) * jax.lax.rsqrt(var + 1e-6)
        y = y * q["scale"].astype(jnp.float32) + q["bias"].astype(jnp.float32)
        return y.astype(dtype if dtype is not None else v.dtype)

    # keep the residual carrier in the INPUT dtype: the module adds the fp32
    # input to the (bf16) postnorm output, promoting to fp32 — casting x to
    # bf16 here would accumulate extra rounding on the residual path. Only
    # matmul operands are cast (via ln()'s output dtype and cast()).
    ln_dst = p["prenorm_dst"] if bipartite else p["prenorm_src"]
    dst_n = ln(x, ln_dst)
    HD = p["to_s"]["kernel"].shape[1]
    # to_g over concat([agg=0, dst_n]): only the dst_n half of the kernel acts
    g = jax.nn.sigmoid(dst_n @ cast(p["to_g"]["kernel"])[HD:]
                       + cast(p["to_g"]["bias"]))
    agg = g * (dst_n @ cast(p["to_s"]["kernel"]) + cast(p["to_s"]["bias"]))
    attn_out = agg @ cast(p["to_out"]["kernel"]) + cast(p["to_out"]["bias"])
    x1 = x + ln(attn_out, p["postnorm"])
    h = ln(x1, p["ff_prenorm"])
    h = jax.nn.relu(h @ cast(p["ff_0"]["kernel"]) + cast(p["ff_0"]["bias"]))
    h = h @ cast(p["ff_1"]["kernel"]) + cast(p["ff_1"]["bias"])
    return x1 + ln(h, p["ff_postnorm"])
