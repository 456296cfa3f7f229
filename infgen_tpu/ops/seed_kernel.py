"""Single-kernel Pallas evaluation of the insertion seed stack + heads.

Why: the closed-loop rollout is dispatch-bound, not FLOP-bound. A TPU trace
of the flagship rollout (scripts/profile_rollout.py --trace) shows ~800
sub-microsecond HLO ops per token step in the insertion-eval region and
~1050 per insert iteration — the seed stack itself (3 layers x
occ/map/agent sublayers + 4 MLP heads) accounts for several hundred of
them, each costing ~0.3-0.5 us of fixed sequencer overhead against
nanoseconds of math. This kernel computes the ENTIRE per-evaluation
program (9 attention sublayers + gate/FFN epilogues + 4 heads) in ONE
pallas_call, so an evaluation costs one dispatch instead of hundreds.

Math matches ops/seed_fast.py (itself exact-equivalence-tested against the
flax modules): fp32 LayerNorm statistics, fp32 score accumulation, masked
softmax with zero-aggregate fallback for fully-masked key sets, gated
update, FFN. Matmul operands are cast to the compute dtype (bf16 under the
flagship policy) with fp32 accumulation — the same MXU contract the XLA
path uses. Verified by tests/test_model.py::test_seed_kernel_equivalence.

Head-dim handling: scores need per-head segment sums over the lane axis.
Mosaic cannot split the 128-lane axis (CLAUDE.md), so scores use a
selector-matrix matmul: S[d, h] = 1 iff d // head_dim == h, giving
  scores = (K * q) @ S            # [N, D] x [D, D] -> [N, D], cols 0..H-1
  attn_lanes = attn @ S^T         # expand [N, H(cols)] back to [N, D]
— two MXU passes instead of a reshape.

Reference behavior being accelerated: the per-iteration seed stack of
agent_decoder.py:1833-1905 (see rollout/closed_loop.py eval_seed).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HEADS = ("seed_state_predict_head", "seed_type_predict_head",
          "seed_shape_predict_head", "seed_pos_rel_token_predict_head")


def selector(D: int, H: int, Hd: int) -> np.ndarray:
    """S[d, h] = 1 iff d // Hd == h (h < H): per-head segment-sum matmul."""
    S = np.zeros((D, D), np.float32)
    for d in range(H * Hd):
        S[d, d // Hd] = 1.0
    return S


def pack_seed_params(dp, L: int, grid_size: int, dtype) -> dict:
    """Stack the 3L sublayer + 4 head param subtrees into dense arrays.

    dp: the agent_decoder param subtree. Sublayer order j = 3*i + s with
    s=0 occ2sa (bipartite), s=1 pt2sa (bipartite), s=2 a2sa (uniform LN).
    Weights are cast to the compute dtype (like flax Dense under a dtype
    policy); LayerNorm params and biases stay fp32 (flax LN computes fp32).
    """
    subs = []
    for i in range(L):
        subs += [dp[f"occ2sa_{i}"], dp[f"pt2sa_{i}"], dp[f"a2sa_{i}"]]

    def st(get, cast=None):
        arrs = [get(p, j) for j, p in enumerate(subs)]
        out = jnp.stack(arrs)
        return out.astype(cast) if cast is not None else out

    lnq = lambda p, j: p["prenorm_dst"] if j % 3 != 2 else p["prenorm_src"]
    packed = dict(
        lnq_s=st(lambda p, j: lnq(p, j)["scale"]),
        lnq_b=st(lambda p, j: lnq(p, j)["bias"]),
        wq=st(lambda p, j: p["to_q"]["kernel"], dtype),
        bq=st(lambda p, j: p["to_q"]["bias"]),
        wg=st(lambda p, j: p["to_g"]["kernel"], dtype),
        bg=st(lambda p, j: p["to_g"]["bias"]),
        ws=st(lambda p, j: p["to_s"]["kernel"], dtype),
        bs=st(lambda p, j: p["to_s"]["bias"]),
        wo=st(lambda p, j: p["to_out"]["kernel"], dtype),
        bo=st(lambda p, j: p["to_out"]["bias"]),
        post_s=st(lambda p, j: p["postnorm"]["scale"]),
        post_b=st(lambda p, j: p["postnorm"]["bias"]),
        ffp_s=st(lambda p, j: p["ff_prenorm"]["scale"]),
        ffp_b=st(lambda p, j: p["ff_prenorm"]["bias"]),
        wf0=st(lambda p, j: p["ff_0"]["kernel"], dtype),
        bf0=st(lambda p, j: p["ff_0"]["bias"]),
        wf1=st(lambda p, j: p["ff_1"]["kernel"], dtype),
        bf1=st(lambda p, j: p["ff_1"]["bias"]),
        ffq_s=st(lambda p, j: p["ff_postnorm"]["scale"]),
        ffq_b=st(lambda p, j: p["ff_postnorm"]["bias"]),
    )

    # heads: MLPLayer = Dense_0 -> LayerNorm_0 -> relu -> Dense_1
    hs = [dp[h] for h in _HEADS]
    D = hs[0]["Dense_0"]["kernel"].shape[0]
    packed["wh0"] = jnp.stack([h["Dense_0"]["kernel"] for h in hs]).astype(dtype)
    packed["bh0"] = jnp.stack([h["Dense_0"]["bias"] for h in hs])
    packed["lnh_s"] = jnp.stack([h["LayerNorm_0"]["scale"] for h in hs])
    packed["lnh_b"] = jnp.stack([h["LayerNorm_0"]["bias"] for h in hs])
    # small heads (state 2 / type 3 / shape 3): zero-pad output cols to D
    wsm, bsm = [], []
    for h in hs[:3]:
        w, b = h["Dense_1"]["kernel"], h["Dense_1"]["bias"]
        wsm.append(jnp.pad(w, ((0, 0), (0, D - w.shape[1]))))
        bsm.append(jnp.pad(b, (0, D - b.shape[0])))
    packed["wsm"] = jnp.stack(wsm).astype(dtype)
    packed["bsm"] = jnp.stack(bsm)
    # pos head: pad grid_size -> next multiple of 128 lanes
    Gp = -(-grid_size // 128) * 128
    wp = hs[3]["Dense_1"]["kernel"]
    packed["wpos"] = jnp.pad(wp, ((0, 0), (0, Gp - wp.shape[1]))).astype(dtype)
    packed["bpos"] = jnp.pad(hs[3]["Dense_1"]["bias"],
                             (0, Gp - grid_size))[None]
    return packed


_PACK_ORDER = ("lnq_s", "lnq_b", "wq", "bq", "wg", "bg", "ws", "bs", "wo",
               "bo", "post_s", "post_b", "ffp_s", "ffp_b", "wf0", "bf0",
               "wf1", "bf1", "ffq_s", "ffq_b", "wh0", "bh0", "lnh_s",
               "lnh_b", "wsm", "bsm", "wpos", "bpos")


def _kernel(L, H, Hd, scale,
            sd_ref, vocc_ref, kpt_ref, vpt_ref, mpl_ref, ka_ref, va_ref,
            ma_ref, S_ref, St_ref,
            lnq_s, lnq_b, wq, bq, wg, bg, ws, bs, wo, bo, post_s, post_b,
            ffp_s, ffp_b, wf0, bf0, wf1, bf1, ffq_s, ffq_b,
            wh0, bh0, lnh_s, lnh_b, wsm, bsm, wpos, bpos,
            osm_ref, opos_ref):
    f32 = jnp.float32
    cdt = kpt_ref.dtype

    def row(ref, j):
        # [1, D] fp32 view of row j of a stacked-vector ref (2D everywhere:
        # Mosaic dislikes 1D intermediates)
        return ref[j:j + 1, :].astype(f32)

    def ln(v, s_ref, j):
        m = jnp.mean(v, -1, keepdims=True)
        var = jnp.mean((v - m) ** 2, -1, keepdims=True)
        y = (v - m) * jax.lax.rsqrt(var + 1e-6)
        return y * row(s_ref[0], j) + row(s_ref[1], j)

    def mm(x, w):
        return jax.lax.dot_general(x.astype(cdt), w,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    S = S_ref[...].astype(f32)
    St = St_ref[...].astype(f32)
    sd = sd_ref[...].astype(f32)                       # [1, D]

    for j in range(3 * L):
        i, s = j // 3, j % 3
        dst_n = ln(sd, (lnq_s, lnq_b), j)              # [1, D] f32
        if s == 0:
            agg = vocc_ref[i:i + 1, :].astype(f32)     # single always-valid key
        else:
            K = (kpt_ref if s == 1 else ka_ref)[i].astype(f32)   # [N, D]
            V = (vpt_ref if s == 1 else va_ref)[i].astype(f32)
            maskf = (mpl_ref if s == 1 else ma_ref)[...]          # [N, D] f32
            q = mm(dst_n, wq[j]) + row(bq, j)          # [1, D] f32
            t = K * q                                  # broadcast over rows
            scores = jax.lax.dot_general(t, S, (((1,), (0,)), ((), ())),
                                         preferred_element_type=f32)
            scores = scores * scale + (maskf - 1.0) * 1e9
            mx = jnp.max(scores, axis=0, keepdims=True)
            e = jnp.exp(scores - mx) * maskf
            ssum = jnp.sum(e, axis=0, keepdims=True)
            attn = e / jnp.maximum(ssum, 1e-30)        # 0 rows when all-masked
            attn_l = jax.lax.dot_general(attn, St, (((1,), (0,)), ((), ())),
                                         preferred_element_type=f32)
            agg = jnp.sum(attn_l * V, axis=0, keepdims=True)      # [1, D]
        # to_g(concat([agg, dst_n])) as a split matmul — Mosaic can't
        # concatenate two [1, D] vectors with mismatched lane offsets
        D = sd.shape[-1]
        wgj = wg[j]
        g = jax.nn.sigmoid(mm(agg, wgj[:D]) + mm(dst_n, wgj[D:])
                           + row(bg, j))
        agg = agg + g * (mm(dst_n, ws[j]) + row(bs, j) - agg)
        x = sd + ln(mm(agg, wo[j]) + row(bo, j), (post_s, post_b), j)
        h = ln(x, (ffp_s, ffp_b), j)
        h = jax.nn.relu(mm(h, wf0[j]) + row(bf0, j))
        h = mm(h, wf1[j]) + row(bf1, j)
        sd = x + ln(h, (ffq_s, ffq_b), j)

    # heads (MLPLayer: dense -> LN -> relu -> dense)
    for hi in range(4):
        h = mm(sd, wh0[hi]) + row(bh0, hi)
        h = jax.nn.relu(ln(h, (lnh_s, lnh_b), hi))
        if hi < 3:
            osm_ref[hi:hi + 1, :] = mm(h, wsm[hi]) + row(bsm, hi)
        else:
            opos_ref[...] = mm(h, wpos[...]) + bpos[...].astype(f32)


def seed_eval_kernel(packed: dict, sd0, v_occ, K_pt, V_pt, maskf_pl,
                     K_a, V_a, maskf_a, S, num_heads: int, head_dim: int,
                     interpret: bool = False):
    """One fused seed-stack + heads evaluation.

    sd0 [1,D] f32; v_occ [L,D]; K_pt/V_pt [L,P,D]; K_a/V_a [L,A,D] in the
    compute dtype; maskf_* [N,D] f32 replicated lane masks; S the selector
    matrix (np or jnp [D,D] f32). Returns (small [8,D] f32, pos [1,Gp] f32)
    where small rows 0/1/2 = state/type/shape head outputs (leading cols).
    """
    L = v_occ.shape[0]
    D = sd0.shape[-1]
    Gp = packed["wpos"].shape[1]
    kern = partial(_kernel, L, num_heads, head_dim, head_dim ** -0.5)
    args = [sd0, v_occ, K_pt, V_pt, maskf_pl, K_a, V_a, maskf_a,
            jnp.asarray(S), jnp.asarray(S).T]
    args += [packed[k] for k in _PACK_ORDER]
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((8, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, Gp), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(*args)
