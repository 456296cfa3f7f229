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

Two variants:
  - `seed_eval_kernel`: stack + heads from PRECOMPUTED per-step K/V
    (ops/seed_fast precompute stays in XLA; 133 -> 84 us/eval measured).
  - `seed_eval_full_kernel`: additionally folds the per-step precompute
    INTO the kernel — occupancy embedding + per-layer occ values, map-key
    geometry contributions on top of the rollout-invariant x_pt
    projections, the 9-sublayer zero-aggregate agent key chains, and the
    agent K/V projections — so one identical call serves both the per-step
    evaluation and every insert iteration, with only the raw inputs (agent
    feature column, relation embeddings, occupancy row) updated outside.

Math matches ops/seed_fast.py (itself exact-equivalence-tested against the
flax modules): fp32 LayerNorm statistics, fp32 score accumulation, masked
softmax with zero-aggregate fallback for fully-masked key sets, gated
update, FFN. Matmul operands are cast to the compute dtype (bf16 under the
flagship policy) with fp32 accumulation — the same MXU contract the XLA
path uses. Verified by tests/test_model.py::test_seed_kernel_equivalence
and ::test_seed_kernel_full_equivalence.

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


def pack_seed_params_full(dp, L: int, grid_size: int, dtype) -> dict:
    """pack_seed_params + the per-step precompute params the full kernel
    folds in: a2sa source K/V projections (fed by the key chains), the
    pt2sa / a2sa geometry (r) projections, the occ2sa value projections,
    and the occupancy MLP (seed_agent_occ_embed = MLPLayer, fp32 — the
    module is constructed without a compute dtype)."""
    packed = pack_seed_params(dp, L, grid_size, dtype)

    def stL(prefix, get, cast=None):
        arrs = [get(dp[f"{prefix}_{i}"]) for i in range(L)]
        out = jnp.stack(arrs)
        return out.astype(cast) if cast is not None else out

    for pre, tag in (("pt2sa", "ptr"), ("a2sa", "sar")):
        packed[f"{tag}_lnr_s"] = stL(pre, lambda p: p["prenorm_r"]["scale"])
        packed[f"{tag}_lnr_b"] = stL(pre, lambda p: p["prenorm_r"]["bias"])
        packed[f"{tag}_wkr"] = stL(pre, lambda p: p["w_kr"], dtype)
        packed[f"{tag}_wvr"] = stL(pre, lambda p: p["w_vr"], dtype)
        packed[f"{tag}_bvr"] = stL(pre, lambda p: p["b_vr"])
    packed["ka_lns_s"] = stL("a2sa", lambda p: p["prenorm_src"]["scale"])
    packed["ka_lns_b"] = stL("a2sa", lambda p: p["prenorm_src"]["bias"])
    packed["ka_wk"] = stL("a2sa", lambda p: p["to_k"]["kernel"], dtype)
    packed["ka_wv"] = stL("a2sa", lambda p: p["to_v"]["kernel"], dtype)
    packed["ka_bv"] = stL("a2sa", lambda p: p["to_v"]["bias"])
    packed["occ_lns_s"] = stL("occ2sa", lambda p: p["prenorm_src"]["scale"])
    packed["occ_lns_b"] = stL("occ2sa", lambda p: p["prenorm_src"]["bias"])
    packed["occ_wv"] = stL("occ2sa", lambda p: p["to_v"]["kernel"], dtype)
    packed["occ_bv"] = stL("occ2sa", lambda p: p["to_v"]["bias"])

    oe = dp["seed_agent_occ_embed"]
    G = oe["Dense_0"]["kernel"].shape[0]
    Gp = -(-G // 128) * 128
    packed["oe_w0"] = jnp.pad(oe["Dense_0"]["kernel"],
                              ((0, Gp - G), (0, 0)))          # fp32
    packed["oe_b0"] = oe["Dense_0"]["bias"][None]
    packed["oe_ln_s"] = oe["LayerNorm_0"]["scale"][None]
    packed["oe_ln_b"] = oe["LayerNorm_0"]["bias"][None]
    packed["oe_w1"] = oe["Dense_1"]["kernel"]
    packed["oe_b1"] = oe["Dense_1"]["bias"][None]
    return packed


_FULL_EXTRA = ("ptr_lnr_s", "ptr_lnr_b", "ptr_wkr", "ptr_wvr", "ptr_bvr",
               "sar_lnr_s", "sar_lnr_b", "sar_wkr", "sar_wvr", "sar_bvr",
               "ka_lns_s", "ka_lns_b", "ka_wk", "ka_wv", "ka_bv",
               "occ_lns_s", "occ_lns_b", "occ_wv", "occ_bv",
               "oe_w0", "oe_b0", "oe_ln_s", "oe_ln_b", "oe_w1", "oe_b1")


def _make_helpers(cdt):
    f32 = jnp.float32

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

    return row, ln, mm


def _stack_and_heads(L, H, scale, helpers, sd, get_occ, get_kvm, S, St,
                     lnq_s, lnq_b, wq, bq, wg, bg, ws, bs, wo, bo,
                     post_s, post_b, ffp_s, ffp_b, wf0, bf0, wf1, bf1,
                     ffq_s, ffq_b, wh0, bh0, lnh_s, lnh_b, wsm, bsm,
                     wpos, bpos, osm_ref, opos_ref):
    """Shared seed stack + heads. sd [1, D] f32. get_occ(i) -> [1, D] f32;
    get_kvm(s, i) -> (K, V, maskf) f32 for sublayer kind s in {1: map,
    2: agent}. Writes the head outputs to osm_ref/opos_ref."""
    row, ln, mm = helpers
    f32 = jnp.float32

    for j in range(3 * L):
        i, s = j // 3, j % 3
        dst_n = ln(sd, (lnq_s, lnq_b), j)              # [1, D] f32
        if s == 0:
            agg = get_occ(i)                           # single always-valid key
        else:
            K, V, maskf = get_kvm(s, i)
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


def _kernel(L, H, Hd, scale,
            sd_ref, vocc_ref, kpt_ref, vpt_ref, mpl_ref, ka_ref, va_ref,
            ma_ref, S_ref, St_ref,
            lnq_s, lnq_b, wq, bq, wg, bg, ws, bs, wo, bo, post_s, post_b,
            ffp_s, ffp_b, wf0, bf0, wf1, bf1, ffq_s, ffq_b,
            wh0, bh0, lnh_s, lnh_b, wsm, bsm, wpos, bpos,
            osm_ref, opos_ref):
    f32 = jnp.float32
    helpers = _make_helpers(kpt_ref.dtype)

    def get_occ(i):
        return vocc_ref[i:i + 1, :].astype(f32)

    def get_kvm(s, i):
        K = (kpt_ref if s == 1 else ka_ref)[i].astype(f32)
        V = (vpt_ref if s == 1 else va_ref)[i].astype(f32)
        maskf = (mpl_ref if s == 1 else ma_ref)[...]
        return K, V, maskf

    _stack_and_heads(L, H, scale, helpers, sd_ref[...].astype(f32),
                     get_occ, get_kvm, S_ref[...].astype(f32),
                     St_ref[...].astype(f32),
                     lnq_s, lnq_b, wq, bq, wg, bg, ws, bs, wo, bo,
                     post_s, post_b, ffp_s, ffp_b, wf0, bf0, wf1, bf1,
                     ffq_s, ffq_b, wh0, bh0, lnh_s, lnh_b, wsm, bsm,
                     wpos, bpos, osm_ref, opos_ref)


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


def _kernel_full(L, H, Hd, scale,
                 sd_ref, k0_ref, v0_ref, rpl_ref, mpl_ref, ac_ref, rsa_ref,
                 ma_ref, occ_ref, S_ref, St_ref,
                 lnq_s, lnq_b, wq, bq, wg, bg, ws, bs, wo, bo, post_s,
                 post_b, ffp_s, ffp_b, wf0, bf0, wf1, bf1, ffq_s, ffq_b,
                 wh0, bh0, lnh_s, lnh_b, wsm, bsm, wpos, bpos,
                 ptr_lnr_s, ptr_lnr_b, ptr_wkr, ptr_wvr, ptr_bvr,
                 sar_lnr_s, sar_lnr_b, sar_wkr, sar_wvr, sar_bvr,
                 ka_lns_s, ka_lns_b, ka_wk, ka_wv, ka_bv,
                 occ_lns_s, occ_lns_b, occ_wv, occ_bv,
                 oe_w0, oe_b0, oe_ln_s, oe_ln_b, oe_w1, oe_b1,
                 osm_ref, opos_ref):
    f32 = jnp.float32
    helpers = _make_helpers(k0_ref.dtype)
    row, ln, mm = helpers

    # occupancy embedding (MLPLayer, fp32 like the module) + per-layer
    # occ2sa value projections
    occ = occ_ref[...]                                        # [1, Gp] f32
    h = jax.lax.dot_general(occ, oe_w0[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32) + oe_b0[...]
    h = jax.nn.relu(ln(h, (oe_ln_s, oe_ln_b), 0))
    occ_emb = jax.lax.dot_general(h, oe_w1[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32) + oe_b1[...]
    v_occ = []
    for i in range(L):
        src_n = ln(occ_emb, (occ_lns_s, occ_lns_b), i)
        v_occ.append(mm(src_n, occ_wv[i]) + row(occ_bv, i))

    # map K/V: rollout-invariant x_pt projections + per-step geometry
    # (ops/seed_fast.r_contrib math)
    rpl = rpl_ref[...].astype(f32)                            # [P, D]
    K_pt, V_pt = [], []
    for i in range(L):
        rn = ln(rpl, (ptr_lnr_s, ptr_lnr_b), i)
        K_pt.append(k0_ref[i].astype(f32) + mm(rn, ptr_wkr[i]))
        V_pt.append(v0_ref[i].astype(f32) + mm(rn, ptr_wvr[i])
                    + row(ptr_bvr, i))

    # agent key chains (seed_key_chain: zero-aggregate gate+FFN passes; the
    # same sublayer params as the stack, agg == 0) and agent K/V
    rsa = rsa_ref[...].astype(f32)                            # [A, D]
    ag = ac_ref[...].astype(f32)
    D = ag.shape[-1]
    K_a, V_a = [], []
    for i in range(L):
        for s in (0, 1):                                      # occ2sa, pt2sa
            j = 3 * i + s
            dst_n = ln(ag, (lnq_s, lnq_b), j)
            g = jax.nn.sigmoid(mm(dst_n, wg[j][D:]) + row(bg, j))
            agg = g * (mm(dst_n, ws[j]) + row(bs, j))
            x = ag + ln(mm(agg, wo[j]) + row(bo, j), (post_s, post_b), j)
            hh = ln(x, (ffp_s, ffp_b), j)
            hh = jax.nn.relu(mm(hh, wf0[j]) + row(bf0, j))
            ag = x + ln(mm(hh, wf1[j]) + row(bf1, j), (ffq_s, ffq_b), j)
        # this layer's a2sa consumes the chain state BEFORE its own zero-agg
        src_n = ln(ag, (ka_lns_s, ka_lns_b), i)
        rn = ln(rsa, (sar_lnr_s, sar_lnr_b), i)
        K_a.append(mm(src_n, ka_wk[i]) + mm(rn, sar_wkr[i]))
        V_a.append(mm(src_n, ka_wv[i]) + row(ka_bv, i)
                   + mm(rn, sar_wvr[i]) + row(sar_bvr, i))
        j = 3 * i + 2                                         # a2sa zero-agg
        dst_n = ln(ag, (lnq_s, lnq_b), j)
        g = jax.nn.sigmoid(mm(dst_n, wg[j][D:]) + row(bg, j))
        agg = g * (mm(dst_n, ws[j]) + row(bs, j))
        x = ag + ln(mm(agg, wo[j]) + row(bo, j), (post_s, post_b), j)
        hh = ln(x, (ffp_s, ffp_b), j)
        hh = jax.nn.relu(mm(hh, wf0[j]) + row(bf0, j))
        ag = x + ln(mm(hh, wf1[j]) + row(bf1, j), (ffq_s, ffq_b), j)

    mpl = mpl_ref[...]
    ma = ma_ref[...]

    def get_occ(i):
        return v_occ[i]

    def get_kvm(s, i):
        if s == 1:
            return K_pt[i], V_pt[i], mpl
        return K_a[i], V_a[i], ma

    _stack_and_heads(L, H, scale, helpers, sd_ref[...].astype(f32),
                     get_occ, get_kvm, S_ref[...].astype(f32),
                     St_ref[...].astype(f32),
                     lnq_s, lnq_b, wq, bq, wg, bg, ws, bs, wo, bo,
                     post_s, post_b, ffp_s, ffp_b, wf0, bf0, wf1, bf1,
                     ffq_s, ffq_b, wh0, bh0, lnh_s, lnh_b, wsm, bsm,
                     wpos, bpos, osm_ref, opos_ref)


def seed_eval_full_kernel(packed: dict, sd0, k0, v0, r_pl, maskf_pl,
                          agent_col, r_sa, maskf_a, occ_row, S,
                          num_heads: int, head_dim: int,
                          interpret: bool = False):
    """Full-precompute seed evaluation: one identical call per evaluation.

    sd0 [1,D] f32; k0/v0 [L,P,D] rollout-invariant x_pt projections
    (ops/seed_fast.precompute_src_kv) in the compute dtype; r_pl [P,D] the
    per-step map geometry embedding (embed_pl2sa_r); agent_col [A,D] the
    raw fused feature column (carry.raw_feat[:, c], inserted rows patched
    outside); r_sa [A,D] the agent geometry embedding (embed_a2sa_r);
    maskf_* [N,D] f32; occ_row [1,Gp] f32 zero-padded occupancy. Returns
    (small [8,D], pos [1,Gp]) like seed_eval_kernel.
    """
    L = k0.shape[0]
    D = sd0.shape[-1]
    Gp = packed["wpos"].shape[1]
    kern = partial(_kernel_full, L, num_heads, head_dim, head_dim ** -0.5)
    args = [sd0, k0, v0, r_pl, maskf_pl, agent_col, r_sa, maskf_a, occ_row,
            jnp.asarray(S), jnp.asarray(S).T]
    args += [packed[k] for k in _PACK_ORDER + _FULL_EXTRA]
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((8, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, Gp), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(*args)
