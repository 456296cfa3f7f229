"""Fused DenseAttention block kernel (forward-only, rollout hot path).

One `pallas_call` computes an ENTIRE DenseAttention layer (model/layers.py):
pre-LN -> QKV -> r-biased masked attention -> gated update -> out-proj ->
post-LN residual -> FFN with pre/post-LN residual. The rollout's per-column
passes dispatch 18 such layers per token step; the hypothesis was that on the
latency-bound chip the ~25 XLA ops per layer dominate wall time, so collapsing
each layer into one kernel would win.

MEASURED OUTCOME (v5e, flagship rollout, B=8 vmap): 194.0k agent-steps/s
fused vs 227.6k plain XLA fp32 — the fused path is ~15% SLOWER. XLA pipelines
the many small ops across its fusions better than a sequential Mosaic grid
re-loading weights per q-tile. Kept as a measured, tested option
(`use_fused_block`, default False); the winning rollout configuration is the
bf16 compute policy on the plain XLA path (283.5k).

Scope (keeps the kernel single-tile over keys):
  - K <= 128 keys, fully VMEM-resident; no online softmax needed
  - deterministic only (no dropout): rollout inference path
  - weights come straight from the DenseAttention param subtree, so the
    param tree is IDENTICAL to the XLA path (checkpoint compatible)

Mosaic constraints honored: the 128-lane head axis is never split; per-head
reductions use the one-hot head-selector matmul trick (ops/pallas_attention).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e30
_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _round_up(x, m):
    return (x + m - 1) // m * m


def _ln(x, scale, bias):
    m = x.mean(axis=-1, keepdims=True)
    v = ((x - m) ** 2).mean(axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + _LN_EPS) * scale + bias


def _kernel(x_ref, xs_ref, r_ref, mask_ref,
            sdst_ref, bdst_ref, ssrc_ref, bsrc_ref,
            wq_ref, bq_ref, wk_ref, wv_ref, bv_ref,
            sr_ref, br_ref, wkr_ref, wvr_ref, bvr_ref,
            wga_ref, wgd_ref, bg_ref, ws_ref, bs_ref, wo_ref, bo_ref,
            spost_ref, bpost_ref, sfp_ref, bfp_ref,
            w0_ref, b0_ref, w1_ref, b1_ref, sfo_ref, bfo_ref,
            sel_ref, out_ref, *, num_heads, head_dim, per_query):
    """One q-tile of the full block. xs_ref: [K, D] shared keys or
    [qt, K, D] per-query keys (static `per_query`)."""
    H, d = num_heads, head_dim
    HD = H * d
    scale = d ** -0.5
    x = x_ref[:]                                      # [qt, D]
    qt = x.shape[0]

    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    dst_n = _ln(x, sdst_ref[:], bdst_ref[:])
    q = dot(dst_n, wq_ref[:]) + bq_ref[:]             # [qt, HD]

    if per_query:
        xs = xs_ref[:]                                # [qt, K, D]
        K = xs.shape[1]
        src_n = _ln(xs.reshape(qt * K, -1), ssrc_ref[:], bsrc_ref[:])
        k = dot(src_n, wk_ref[:]).reshape(qt, K, HD)
        v = (dot(src_n, wv_ref[:]) + bv_ref[:]).reshape(qt, K, HD)
    else:
        xs = xs_ref[:]                                # [K, D]
        K = xs.shape[0]
        src_n = _ln(xs, ssrc_ref[:], bsrc_ref[:])
        k = dot(src_n, wk_ref[:]).reshape(1, K, HD)
        v = (dot(src_n, wv_ref[:]) + bv_ref[:]).reshape(1, K, HD)

    r = r_ref[:]                                      # [qt, K, D]
    rn = _ln(r.reshape(qt * K, -1), sr_ref[:], br_ref[:])
    kr = dot(rn, wkr_ref[:]).reshape(qt, K, HD)
    vr = (dot(rn, wvr_ref[:]) + bvr_ref[:]).reshape(qt, K, HD)

    k_eff = k + kr
    v_eff = v + vr
    sim = dot((q[:, None, :] * k_eff).reshape(qt * K, HD),
              sel_ref[:]).reshape(qt, K, H) * scale   # [qt, K, H]
    maskf = mask_ref[:].astype(jnp.float32)[:, :, None]
    sim = sim * maskf + (1.0 - maskf) * NEG_INF

    m = sim.max(axis=1)                               # [qt, H]
    p = jnp.exp(sim - m[:, None, :]) * maskf
    den = p.sum(axis=1)                               # [qt, H]
    # back to the full lane axis: p_full[q, k, hd] = p[q, k, head(hd)]
    p_full = jax.lax.dot_general(
        p.reshape(qt * K, H), sel_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(qt, K, HD)
    den_full = jax.lax.dot_general(
        den, sel_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [qt, HD]
    agg = (p_full * v_eff).sum(axis=1) / jnp.maximum(den_full, 1e-30)

    # gated update: to_g over concat([agg, dst_n]) split into two matmuls
    g = jax.nn.sigmoid(dot(agg, wga_ref[:]) + dot(dst_n, wgd_ref[:])
                       + bg_ref[:])
    s = dot(dst_n, ws_ref[:]) + bs_ref[:]
    agg = agg + g * (s - agg)
    attn_out = dot(agg, wo_ref[:]) + bo_ref[:]        # [qt, D]

    x1 = x + _ln(attn_out, spost_ref[:], bpost_ref[:])
    h = _ln(x1, sfp_ref[:], bfp_ref[:])
    h = jnp.maximum(dot(h, w0_ref[:]) + b0_ref[:], 0.0)
    h = dot(h, w1_ref[:]) + b1_ref[:]
    out_ref[:] = x1 + _ln(h, sfo_ref[:], bfo_ref[:])


def fused_attention_block(p, x_dst, x_src, r, mask, num_heads: int,
                          bipartite: bool = False, interpret=None):
    """Full DenseAttention layer as one kernel.

    p: the layer's param subtree (params/<layer_name> from the model tree —
    identical to what the flax module consumes). x_dst [Q, D]; x_src [K, D]
    (shared keys), [Q, K, D] (gathered per-query keys), or None (self-
    attention); r [Q, K, D] Fourier-embedded relative geometry; mask [Q, K].
    Deterministic only (rollout path). Returns [Q, D] float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = x_dst.shape[-1]
    Q = x_dst.shape[0]
    per_query = x_src is not None and x_src.ndim == 3
    if x_src is None:
        x_src = x_dst
    K = x_src.shape[-2]
    HD = p["to_q"]["kernel"].shape[1]
    H = num_heads
    d = HD // H

    qt = min(64, _round_up(Q, 8))
    Qp = _round_up(Q, qt)
    Kp = _round_up(K, 8)
    f32 = jnp.float32

    xq = jnp.pad(x_dst.astype(f32), ((0, Qp - Q), (0, 0)))
    rp = jnp.pad(r.astype(f32), ((0, Qp - Q), (0, Kp - K), (0, 0)))
    mp = jnp.pad(mask.astype(jnp.int32), ((0, Qp - Q), (0, Kp - K)))
    if per_query:
        xs = jnp.pad(x_src.astype(f32), ((0, Qp - Q), (0, Kp - K), (0, 0)))
        xs_spec = pl.BlockSpec((qt, Kp, D), lambda qi: (qi, 0, 0))
    else:
        xs = jnp.pad(x_src.astype(f32), ((0, Kp - K), (0, 0)))
        xs_spec = pl.BlockSpec((Kp, D), lambda qi: (0, 0))

    ln_dst = p["prenorm_dst"] if bipartite else p["prenorm_src"]
    row = lambda a: a.astype(f32).reshape(1, -1)
    # to_g consumes concat([agg (HD), dst_n (D)]): split its kernel at row HD
    # into the two matmul halves (shapes differ unless HD == D)
    wg = p["to_g"]["kernel"].astype(f32)
    wg_a, wg_d = wg[:HD], wg[HD:]
    weights = [
        row(ln_dst["scale"]), row(ln_dst["bias"]),
        row(p["prenorm_src"]["scale"]), row(p["prenorm_src"]["bias"]),
        p["to_q"]["kernel"].astype(f32), row(p["to_q"]["bias"]),
        p["to_k"]["kernel"].astype(f32),
        p["to_v"]["kernel"].astype(f32), row(p["to_v"]["bias"]),
        row(p["prenorm_r"]["scale"]), row(p["prenorm_r"]["bias"]),
        p["w_kr"].astype(f32), p["w_vr"].astype(f32), row(p["b_vr"]),
        wg_a, wg_d, row(p["to_g"]["bias"]),
        p["to_s"]["kernel"].astype(f32), row(p["to_s"]["bias"]),
        p["to_out"]["kernel"].astype(f32), row(p["to_out"]["bias"]),
        row(p["postnorm"]["scale"]), row(p["postnorm"]["bias"]),
        row(p["ff_prenorm"]["scale"]), row(p["ff_prenorm"]["bias"]),
        p["ff_0"]["kernel"].astype(f32), row(p["ff_0"]["bias"]),
        p["ff_1"]["kernel"].astype(f32), row(p["ff_1"]["bias"]),
        row(p["ff_postnorm"]["scale"]), row(p["ff_postnorm"]["bias"]),
    ]
    head_sel = jnp.asarray(np.repeat(np.eye(H, dtype=np.float32), d, axis=0))

    w_specs = [pl.BlockSpec(w.shape, lambda qi, n=w.ndim: (0,) * n)
               for w in weights]
    kernel = functools.partial(_kernel, num_heads=H, head_dim=d,
                               per_query=per_query)
    out = pl.pallas_call(
        kernel,
        grid=(Qp // qt,),
        in_specs=[
            pl.BlockSpec((qt, D), lambda qi: (qi, 0)),
            xs_spec,
            pl.BlockSpec((qt, Kp, D), lambda qi: (qi, 0, 0)),
            pl.BlockSpec((qt, Kp), lambda qi: (qi, 0)),
            *w_specs,
            pl.BlockSpec(head_sel.shape, lambda qi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((qt, D), lambda qi: (qi, 0)),
        out_shape=jax.ShapeDtypeStruct((Qp, D), f32),
        interpret=interpret,
    )(xq, xs, rp, mp, *weights, head_sel)
    return out[:Q].astype(x_dst.dtype)
