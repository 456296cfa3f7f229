"""Decomposed seed-stack evaluation with precomputed keys/values.

The insertion seed stack evaluates ONE query (the seed) against three key
sets per layer: the occupancy embedding (single key), the map tokens
(rollout-invariant x_pt + per-step ego-relative geometry), and the agent
rows (per-step zero-agg snapshots, patched per insert). The DenseAttention
module recomputes every key/value projection per evaluation; these pure
functions split the computation so that

  - x_pt key/value projections happen ONCE per rollout,
  - geometry (r) contributions and agent-row projections ONCE per step,
  - single-row patches after each insertion,
  - and the per-evaluation work is just: query projection, scores, softmax,
    gated update, FFN (~1/3 of the module's op count).

The math is IDENTICAL to model/layers.py DenseAttention (same LayerNorm
statistics, fp32 score accumulation, gated update, FFN), verified by
tests/test_model.py::test_seed_fast_equivalence. The one float-order
difference: scores use q.(k + k_r) in one einsum where the module computes
q.k + q.k_r in two — same value up to ~1e-7 summation order.

Param subtrees follow the flax layer layout (see
layers.dense_attention_zero_agg for the same convention).
"""

import jax
import jax.numpy as jnp


def _cast(w, dtype):
    return w.astype(dtype) if dtype is not None else w


def _ln(v, p, dtype):
    """flax LayerNorm: fp32 statistics, eps 1e-6, scale+bias, output cast."""
    v32 = v.astype(jnp.float32)
    m = v32.mean(axis=-1, keepdims=True)
    var = ((v32 - m) ** 2).mean(axis=-1, keepdims=True)
    y = (v32 - m) * jax.lax.rsqrt(var + 1e-6)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype if dtype is not None else v.dtype)


def _mm(x, p, dtype):
    y = x @ _cast(p["kernel"], dtype)
    if "bias" in p:
        y = y + _cast(p["bias"], dtype)
    return y


def precompute_src_kv(p, x_src, dtype=None):
    """Source-side k/v projections (no geometry): [N, H*Hd] each.

    For x_pt these are rollout-invariant; for agent-row snapshots they are
    step-invariant (patched per insert via the same function on one row).
    """
    src_n = _ln(x_src, p["prenorm_src"], dtype)
    return _mm(src_n, p["to_k"], dtype), _mm(src_n, p["to_v"], dtype)


def r_contrib(p, r_emb, dtype=None):
    """Geometry contributions k_r/v_r from the (Fourier-embedded) relation
    r: [N, H*Hd] each. Matches the module's prenorm_r -> w_kr/w_vr path."""
    r_n = _ln(r_emb, p["prenorm_r"], dtype)
    k_r = r_n @ _cast(p["w_kr"], dtype)
    v_r = r_n @ _cast(p["w_vr"], dtype) + _cast(p["b_vr"], dtype)
    return k_r, v_r


def gate_ffn(p, x_dst, dst_n, agg, dtype=None):
    """Gated update + FFN epilogue shared by every path (layers.py:239-255).
    Residual carrier stays in the input dtype like the module."""
    g = jax.nn.sigmoid(_mm(jnp.concatenate([agg, dst_n], -1), p["to_g"], dtype))
    agg = agg + g * (_mm(dst_n, p["to_s"], dtype) - agg)
    attn_out = _mm(agg, p["to_out"], dtype)
    x = x_dst + _ln(attn_out, p["postnorm"], dtype)
    h = _ln(x, p["ff_prenorm"], dtype)
    h = jax.nn.relu(_mm(h, p["ff_0"], dtype))
    h = _mm(h, p["ff_1"], dtype)
    return x + _ln(h, p["ff_postnorm"], dtype)


def attn_1q(p, sd, k, v, mask, num_heads, dtype=None, bipartite=True):
    """One-query attention over precomputed keys/values + epilogue.

    sd [D]; k/v [N, H*Hd] (source projections + geometry contributions
    already summed); mask [N]. Scores accumulate in fp32 like the module.
    """
    dst_n = _ln(sd, p["prenorm_dst" if bipartite else "prenorm_src"], dtype)
    q = _mm(dst_n, p["to_q"], dtype)
    H = num_heads
    Hd = q.shape[-1] // H
    sim = jnp.einsum("hd,khd->kh", q.reshape(H, Hd), k.reshape(-1, H, Hd),
                     preferred_element_type=jnp.float32) * (Hd ** -0.5)
    sim = jnp.where(mask[:, None], sim, -jnp.inf)
    attn = jax.nn.softmax(sim, axis=0)
    attn = jnp.where(mask.any(), attn, 0.0)
    attn = jnp.where(mask[:, None], attn, 0.0)
    attn = attn.astype(v.dtype)
    agg = jnp.einsum("kh,khd->hd", attn, v.reshape(-1, H, Hd)).reshape(-1)
    return gate_ffn(p, sd, dst_n, agg, dtype)


def attn_1q_single_key(p, sd, v_key, dtype=None):
    """One query, ONE always-valid key (the occ2sa layer): softmax over a
    single key is identically 1, so agg == that key's value projection —
    no q/k projections or softmax at all."""
    dst_n = _ln(sd, p["prenorm_dst"], dtype)
    return gate_ffn(p, sd, dst_n, v_key, dtype)


def occ_value(p, occ_emb, dtype=None):
    """Value projection of the occupancy embedding (the occ2sa single key):
    recomputed only when the occupancy vector changes (per insertion)."""
    src_n = _ln(occ_emb, p["prenorm_src"], dtype)
    return _mm(src_n, p["to_v"], dtype)
