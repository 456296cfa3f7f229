"""Single-kernel Pallas heading/offset refine for one inserted agent.

Why: each insert iteration runs the refine subgraph — num_seed_layers x
(map attention + agent attention) over the inserted agent's [1 + 24]-row
neighborhood plus two prediction heads — as ~250 sub-microsecond XLA ops
(rollout/closed_loop.py _do_insert), a large slice of the ~500 us/insert
cost on the dispatch-bound v5e. This kernel computes the whole refine pass
(attention sublayers, zero-aggregate neighbor updates, both heads) in ONE
pallas_call.

Structure trick: only row 0 (the inserted agent) has incident edges; rows
1..K are zero-aggregate pass-throughs whose transformed features feed row
0's keys at later layers (agent_decoder.py:2050-2058, refine_column_sub).
The gated update g = sigmoid(to_g([agg, dst_n])) with agg == 0 IS the
zero-aggregate closed form, so the kernel computes row 0's attention
aggregate, scatters it into an otherwise-zero [R, D] aggregate, and runs
ONE shared gate/FFN epilogue over all rows — no per-row special casing.

Math matches model/layers.py DenseAttention / dense_attention_zero_agg:
fp32 LayerNorm statistics and score accumulation, masked softmax with zero
aggregate for fully-masked key sets, compute-dtype matmul operands with
fp32 accumulation. Selector-matrix matmuls handle per-head score segments
(the 128-lane axis is never split — CLAUDE.md).

Verified: tests/test_refine_kernel.py (exact fp32 equivalence vs
refine_column_sub + refine_heads) and
tests/test_rollout.py::test_rollout_refine_kernel_ab (bitwise-identical
forced-insertion rollouts).

Reference behavior being accelerated: agent_decoder.py:2001-2074 (the
per-insert heading/offset refinement of inference()).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infgen_tpu.ops.seed_kernel import _make_helpers, selector  # noqa: F401


def pack_refine_params(dp, L: int, angle_size: int, dtype) -> dict:
    """Stack the refine sublayer + head params.

    dp: the agent_decoder param subtree. Sublayer order j = 2*i + s with
    s=0 the map layer (pt2a_{i}, bipartite) and s=1 the agent layer
    (a2a_{i}, uniform LN) — the refine pass reuses the TRUNK layers 0..L-1
    (refine_column_sub). Heads: seed_heading_rel_token_predict_head and
    seed_offset_xy_predict_head (MLPLayer), outputs padded to 128 lanes.
    """
    subs = []
    for i in range(L):
        subs += [dp[f"pt2a_{i}"], dp[f"a2a_{i}"]]

    def st(get, cast=None):
        arrs = [get(p, j) for j, p in enumerate(subs)]
        out = jnp.stack(arrs)
        return out.astype(cast) if cast is not None else out

    lnq = lambda p, j: p["prenorm_dst"] if j % 2 == 0 else p["prenorm_src"]
    packed = dict(
        lnq_s=st(lambda p, j: lnq(p, j)["scale"]),
        lnq_b=st(lambda p, j: lnq(p, j)["bias"]),
        lns_s=st(lambda p, j: p["prenorm_src"]["scale"]),
        lns_b=st(lambda p, j: p["prenorm_src"]["bias"]),
        wq=st(lambda p, j: p["to_q"]["kernel"], dtype),
        bq=st(lambda p, j: p["to_q"]["bias"]),
        wk=st(lambda p, j: p["to_k"]["kernel"], dtype),
        wv=st(lambda p, j: p["to_v"]["kernel"], dtype),
        bv=st(lambda p, j: p["to_v"]["bias"]),
        lnr_s=st(lambda p, j: p["prenorm_r"]["scale"]),
        lnr_b=st(lambda p, j: p["prenorm_r"]["bias"]),
        wkr=st(lambda p, j: p["w_kr"], dtype),
        wvr=st(lambda p, j: p["w_vr"], dtype),
        bvr=st(lambda p, j: p["b_vr"]),
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

    # heads: MLPLayer = Dense_0 -> LayerNorm_0 -> relu -> Dense_1; pad
    # output cols (angle_size / 2) to 128 lanes
    hs = [dp["seed_heading_rel_token_predict_head"],
          dp["seed_offset_xy_predict_head"]]
    D = hs[0]["Dense_0"]["kernel"].shape[0]
    packed["wh0"] = jnp.stack([h["Dense_0"]["kernel"]
                               for h in hs]).astype(dtype)
    packed["bh0"] = jnp.stack([h["Dense_0"]["bias"] for h in hs])
    packed["lnh_s"] = jnp.stack([h["LayerNorm_0"]["scale"] for h in hs])
    packed["lnh_b"] = jnp.stack([h["LayerNorm_0"]["bias"] for h in hs])
    # pad head outputs (angle_size and 2) to a shared 128-multiple lane count
    Ho = -(-max(angle_size, 2) // 128) * 128
    wh1, bh1 = [], []
    for h in hs:
        w, b = h["Dense_1"]["kernel"], h["Dense_1"]["bias"]
        wh1.append(jnp.pad(w, ((0, 0), (0, Ho - w.shape[1]))))
        bh1.append(jnp.pad(b, (0, Ho - b.shape[0])))
    packed["wh1"] = jnp.stack(wh1).astype(dtype)
    packed["bh1"] = jnp.stack(bh1)
    return packed


_ORDER = ("lnq_s", "lnq_b", "lns_s", "lns_b", "wq", "bq", "wk", "wv", "bv",
          "lnr_s", "lnr_b", "wkr", "wvr", "bvr", "wg", "bg", "ws", "bs",
          "wo", "bo", "post_s", "post_b", "ffp_s", "ffp_b", "wf0", "bf0",
          "wf1", "bf1", "ffq_s", "ffq_b", "wh0", "bh0", "lnh_s", "lnh_b",
          "wh1", "bh1")


def _kernel(L, scale,
            x_ref, plk_ref, rpl_ref, mpl_ref, raa_ref, ma_ref, S_ref, St_ref,
            lnq_s, lnq_b, lns_s, lns_b, wq, bq, wk, wv, bv,
            lnr_s, lnr_b, wkr, wvr, bvr, wg, bg, ws, bs, wo, bo,
            post_s, post_b, ffp_s, ffp_b, wf0, bf0, wf1, bf1, ffq_s, ffq_b,
            wh0, bh0, lnh_s, lnh_b, wh1, bh1, out_ref):
    f32 = jnp.float32
    helpers = _make_helpers(wq.dtype)
    row, ln, mm = helpers

    S = S_ref[...].astype(f32)
    St = St_ref[...].astype(f32)
    x = x_ref[...].astype(f32)                           # [R, D]
    R, D = x.shape
    plk = plk_ref[...].astype(f32)                       # [R, D] map keys
    rpl = rpl_ref[...].astype(f32)
    raa = raa_ref[...].astype(f32)
    row0 = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) == 0)

    def attend1q(dst_n0, K, V, maskf):
        q = mm(dst_n0, wq[j]) + row(bq, j)               # [1, D]
        t = K * q
        scores = jax.lax.dot_general(t, S, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        scores = scores * scale + (maskf - 1.0) * 1e9
        mx = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - mx) * maskf
        ssum = jnp.sum(e, axis=0, keepdims=True)
        attn = e / jnp.maximum(ssum, 1e-30)
        attn_l = jax.lax.dot_general(attn, St, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        return jnp.sum(attn_l * V, axis=0, keepdims=True)

    for j in range(2 * L):
        i, s = j // 2, j % 2
        dst_n = ln(x, (lnq_s, lnq_b), j)                 # [R, D] all rows
        if s == 0:
            src = plk
            rn = ln(rpl, (lnr_s, lnr_b), j)
        else:
            src = x                                      # agent keys = rows
            rn = ln(raa, (lnr_s, lnr_b), j)
        src_n = ln(src, (lns_s, lns_b), j)
        K = mm(src_n, wk[j]) + mm(rn, wkr[j])
        V = mm(src_n, wv[j]) + row(bv, j) + mm(rn, wvr[j]) + row(bvr, j)
        maskf = (mpl_ref if s == 0 else ma_ref)[...]     # [R, D] f32
        agg0 = attend1q(dst_n[0:1], K, V, maskf)
        # zero aggregate everywhere except row 0: the shared gate/FFN
        # epilogue with agg == 0 is exactly dense_attention_zero_agg
        agg = jnp.where(row0, agg0, 0.0)
        wgj = wg[j]
        g = jax.nn.sigmoid(mm(agg, wgj[:D]) + mm(dst_n, wgj[D:])
                           + row(bg, j))
        agg = agg + g * (mm(dst_n, ws[j]) + row(bs, j) - agg)
        x1 = x + ln(mm(agg, wo[j]) + row(bo, j), (post_s, post_b), j)
        h = ln(x1, (ffp_s, ffp_b), j)
        h = jax.nn.relu(mm(h, wf0[j]) + row(bf0, j))
        h = mm(h, wf1[j]) + row(bf1, j)
        x = x1 + ln(h, (ffq_s, ffq_b), j)

    feat0 = x[0:1]
    for hi in range(2):
        h = mm(feat0, wh0[hi]) + row(bh0, hi)
        h = jax.nn.relu(ln(h, (lnh_s, lnh_b), hi))
        out_ref[hi:hi + 1, :] = mm(h, wh1[hi]) + row(bh1, hi)


def refine_kernel(packed: dict, x_sub, pl_keys, r_pl, maskf_pl, r_aa,
                  maskf_a, S, num_heads: int, head_dim: int,
                  interpret: bool = False):
    """One fused refine pass. x_sub [R, D] f32 with row 0 = the inserted
    agent (rows past the real neighborhood are zero-padded and masked);
    pl_keys/r_pl [R, D]; r_aa [R, D] aligned to x rows (relation of key
    row k, rows 0 and padding masked); maskf_* [R, D] f32. Returns
    out [2, Ho] f32 (Ho = angle_size rounded up to 128 lanes): row 0 =
    heading-token logits (leading angle_size lanes), row 1 = offset head
    output (leading 2 lanes, pre-tanh). num_heads/head_dim describe the
    packed params' head layout (encoded in the selector S; only the
    softmax scale is used directly)."""
    L = packed["wq"].shape[0] // 2
    Ho = packed["wh1"].shape[2]
    kern = partial(_kernel, L, head_dim ** -0.5)
    args = [x_sub, pl_keys, r_pl, maskf_pl, r_aa, maskf_a,
            jnp.asarray(S), jnp.asarray(S).T]
    args += [packed[k] for k in _ORDER]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, Ho), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
