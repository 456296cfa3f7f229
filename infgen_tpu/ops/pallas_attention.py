"""Pallas TPU kernel: masked attention with relative-geometry K/V bias.

The framework's core attention (model/layers.py DenseAttention) biases keys
and values per (query, key) pair: K_eff = K + r @ W_kr, V_eff = V + r @ W_vr,
where r is the Fourier-embedded relative geometry. XLA materializes the
projected bias tensors ([B, Q, K, H*d], the largest intermediates in the
trunk) in HBM; this kernel streams r through VMEM one key tile at a time and
fuses projection + score + online softmax + weighted sum, so the bias never
touches HBM.

Mosaic constraints shape the design:
  - the 128-lane (H*d) axis is never split into heads; per-head dots are
    lane-contraction matmuls against a one-hot head-selector E [H*d, H]:
    sim[..., h] = ((q * k_eff) @ E)[..., h], and p_full = p @ E^T
  - grid = (B, num_key_tiles); the key-tile axis iterates sequentially, with
    running max / denominator / accumulator carried in VMEM scratch
    (flash-attention online softmax).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, r_ref, wk_ref, wv_ref, mask_ref, drop_ref,
            sel_ref, out_ref, m_ref, den_ref, acc_ref, *, num_heads, head_dim,
            num_k_tiles):
    """Blocks per (b, j): q [1, N, HD]; k/v [1, Tk, HD]; r [1, N, Tk, Dr];
    mask [1, N, Tk]; drop [1, N, Tk, H] per-head post-softmax dropout
    multiplier (1/(1-rate) kept, 0 dropped, all-ones at eval); sel [HD, H];
    out [1, N, HD].
    Scratch: m/den [N, H], acc [N, HD] — carried across the j grid axis.
    Dropout applies to normalized weights (torch semantics: the softmax
    denominator is undropped), so den accumulates p while acc accumulates
    p * drop."""
    H, d = num_heads, head_dim
    HD = H * d
    N = q_ref.shape[1]
    Tk = k_ref.shape[1]
    scale = d ** -0.5
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        den_ref[:] = jnp.zeros_like(den_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                     # [N, HD]
    ks = k_ref[0]                                    # [Tk, HD]
    vs = v_ref[0]
    r = r_ref[0]                                     # [N, Tk, Dr]
    # float mask: Mosaic can't expand minor dims of i1 vectors
    maskf = mask_ref[0].astype(jnp.float32)[:, :, None]  # [N, Tk, 1]

    kr = jax.lax.dot_general(
        r.reshape(N * Tk, -1), wk_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(N, Tk, HD)
    k_eff = ks.reshape(1, Tk, HD) + kr
    sim = jax.lax.dot_general(
        (q[:, None, :] * k_eff).reshape(N * Tk, HD), sel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(N, Tk, H) * scale
    sim = sim * maskf + (1.0 - maskf) * NEG_INF

    m_old = m_ref[:]                                 # [N, H]
    m_new = jnp.maximum(m_old, sim.max(axis=1))
    corr = jnp.exp(m_old - m_new)                    # [N, H]
    p = jnp.exp(sim - m_new[:, None, :]) * maskf     # [N, Tk, H]

    vr = jax.lax.dot_general(
        r.reshape(N * Tk, -1), wv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(N, Tk, HD)
    v_eff = vs.reshape(1, Tk, HD) + vr
    p_acc = p * drop_ref[0].astype(jnp.float32)      # [N, Tk, H] per-head
    p_full = jax.lax.dot_general(
        p_acc.reshape(N * Tk, H), sel_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(N, Tk, HD)
    corr_full = jax.lax.dot_general(
        corr, sel_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [N, HD]

    m_ref[:] = m_new
    den_ref[:] = den_ref[:] * corr + p.sum(axis=1)
    acc_ref[:] = acc_ref[:] * corr_full + (p_full * v_eff).sum(axis=1)

    @pl.when(j == num_k_tiles - 1)
    def _():
        den_full = jax.lax.dot_general(
            den_ref[:], sel_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [N, HD]
        out_ref[0] = acc_ref[:] / jnp.maximum(den_full, 1e-30)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def r_biased_attention(q, k, v, r, w_kr, w_vr, mask, num_heads: int,
                       drop=None, interpret=None):
    """Fused masked attention with r-biased K/V.

    q: [B, Q, H*d]; k/v: [B, K, H*d]; r: [B, Q, K, Dr]; w_kr/w_vr: [Dr, H*d];
    mask: [B, Q, K] bool (Q == K for self-attention; bipartite calls like the
    training seed stack have Q != K). Returns [B, Q, H*d] ==
    softmax(q(k+rWk)^T)(v+rWv), with fully-masked queries producing zeros
    (DenseAttention semantics). drop: optional [B, Q, K, H] per-head
    post-softmax dropout multiplier (0 dropped, 1/(1-rate) kept) — torch
    attention-dropout semantics (nn.Dropout on the [..., H] weights is
    i.i.d. per head).
    """
    B, Q, HD = q.shape
    K = k.shape[1]
    H = num_heads
    d = HD // H
    Dr = r.shape[-1]
    if interpret is None:
        # Mosaic only lowers on TPU; interpret mode keeps CPU tests runnable
        interpret = jax.default_backend() != "tpu"
    if drop is None:
        drop = jnp.ones((B, Q, K, H), jnp.float32)

    # lane-aligned key tiles (128) and modest query tiles keep the r block
    # within VMEM with double buffering
    k_tile = 128
    q_tile = 48
    Nk = _round_up(K, k_tile)
    Np = _round_up(Q, q_tile)
    num_k_tiles = Nk // k_tile
    num_q_tiles = Np // q_tile

    qp = jnp.pad(q, ((0, 0), (0, Np - Q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Nk - K), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Nk - K), (0, 0)))
    rp = jnp.pad(r, ((0, 0), (0, Np - Q), (0, Nk - K), (0, 0)))
    mp = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, Np - Q), (0, Nk - K)))
    dp = jnp.pad(drop.astype(jnp.float32),
                 ((0, 0), (0, Np - Q), (0, Nk - K), (0, 0)))

    kernel = functools.partial(_kernel, num_heads=H, head_dim=d,
                               num_k_tiles=num_k_tiles)
    head_sel = jnp.asarray(
        np.repeat(np.eye(H, dtype=np.float32), d, axis=0))  # [HD, H]

    out = pl.pallas_call(
        kernel,
        grid=(B, num_q_tiles, num_k_tiles),
        in_specs=[
            pl.BlockSpec((1, q_tile, HD), lambda b, qi, j: (b, qi, 0)),
            pl.BlockSpec((1, k_tile, HD), lambda b, qi, j: (b, j, 0)),
            pl.BlockSpec((1, k_tile, HD), lambda b, qi, j: (b, j, 0)),
            pl.BlockSpec((1, q_tile, k_tile, Dr), lambda b, qi, j: (b, qi, j, 0)),
            pl.BlockSpec((Dr, HD), lambda b, qi, j: (0, 0)),
            pl.BlockSpec((Dr, HD), lambda b, qi, j: (0, 0)),
            pl.BlockSpec((1, q_tile, k_tile), lambda b, qi, j: (b, qi, j)),
            pl.BlockSpec((1, q_tile, k_tile, H), lambda b, qi, j: (b, qi, j, 0)),
            pl.BlockSpec((HD, H), lambda b, qi, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, HD), lambda b, qi, j: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, HD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q_tile, H), jnp.float32),
            pltpu.VMEM((q_tile, H), jnp.float32),
            pltpu.VMEM((q_tile, HD), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, rp, w_kr, w_vr, mp, dp, head_sel)
    return out[:, :Q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 9))
def r_biased_attention_trainable(q, k, v, r, w_kr, w_vr, mask, num_heads: int,
                                 drop=None, interpret=None):
    """`r_biased_attention` with a custom VJP so training can run through the
    fused kernel.

    Forward: the Pallas kernel (bias tensors never touch HBM). Backward:
    recompute-based (flash-style) — nothing is saved from the fused forward
    except the raw inputs; the backward re-derives the attention weights via
    the XLA formulation and differentiates it. Activation memory matches the
    `nn.remat` policy the model already uses; gradients are exactly those of
    the reference math (verified in tests/test_pallas_attention.py).
    """
    return r_biased_attention(q, k, v, r, w_kr, w_vr, mask, num_heads, drop,
                              interpret)


def _rba_fwd(q, k, v, r, w_kr, w_vr, mask, num_heads, drop=None,
             interpret=None):
    out = r_biased_attention(q, k, v, r, w_kr, w_vr, mask, num_heads, drop,
                             interpret)
    return out, (q, k, v, r, w_kr, w_vr, mask, drop)


def _rba_bwd(num_heads, interpret, res, g):
    import numpy as np

    q, k, v, r, w_kr, w_vr, mask, drop = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, r_, wk_, wv_: r_biased_attention_reference(
            q_, k_, v_, r_, wk_, wv_, mask, num_heads, drop),
        q, k, v, r, w_kr, w_vr)
    dq, dk, dv, dr, dwk, dwv = vjp(g)
    # bool mask cotangent is float0; drop is not differentiated (its
    # cotangent is only needed structurally)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    ddrop = None if drop is None else jnp.zeros_like(drop)
    return dq, dk, dv, dr, dwk, dwv, dmask, ddrop


r_biased_attention_trainable.defvjp(_rba_fwd, _rba_bwd)


def r_biased_attention_reference(q, k, v, r, w_kr, w_vr, mask, num_heads: int,
                                 drop=None):
    """Plain-XLA reference implementation (DenseAttention core math)."""
    B, N, HD = q.shape
    K = k.shape[1]
    H = num_heads
    d = HD // H
    qh = q.reshape(B, N, H, d)
    kh = k.reshape(B, K, H, d)
    vh = v.reshape(B, K, H, d)
    kr = (r @ w_kr).reshape(B, N, K, H, d)
    vr = (r @ w_vr).reshape(B, N, K, H, d)
    sim = jnp.einsum("bqhd,bkhd->bqkh", qh, kh)
    sim = sim + jnp.einsum("bqhd,bqkhd->bqkh", qh, kr)
    sim = sim * (d ** -0.5)
    mask = jnp.asarray(mask)
    sim = jnp.where(mask[..., None], sim, -jnp.inf)
    p = jax.nn.softmax(sim, axis=2)
    p = jnp.where(jnp.any(mask, -1)[..., None, None], p, 0.0)
    p = jnp.where(mask[..., None], p, 0.0)
    if drop is not None:
        p = p * drop  # [B, N, K, H] per-head multiplier
    out = jnp.einsum("bqkh,bkhd->bqhd", p, vh)
    out = out + jnp.einsum("bqkh,bqkhd->bqhd", p, vr)
    return out.reshape(B, N, HD)
