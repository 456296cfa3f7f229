"""Whole-trunk-column Pallas kernel: all L agent layers in ONE dispatch.

Why: the closed-loop rollout's motion pass is the largest latency region
(~65 ms of a 115 ms flagship rollout; device trace: ~1400 sub-microsecond
HLO ops per token step). The per-layer fused kernel (ops/fused_block)
collapses each DenseAttention into one dispatch but still pays 18 kernel
launches + per-call weight reloads per column and measured no end-to-end
win (113.9 vs 115.2 ms). This kernel runs the ENTIRE column — L layers x
(temporal -> map -> agent-agent) sublayers — in one pallas_call with a
sequential grid over layers:

  - the temporal key stack [L, A, W, D] streams one layer-block per grid
    step (double-buffered DMA overlaps the previous layer's compute),
  - the relation embeddings r_t / r_pl / r_aa and the map keys stay VMEM-
    resident across all grid steps (constant index_map -> fetched once),
  - the running column x lives in a VMEM scratch that persists across the
    sequential TPU grid, so no layer output ever round-trips HBM,
  - per-layer weights ride in stacked [L, ...] arrays sliced by the grid,
  - each sublayer's per-query work runs as a `lax.fori_loop` over query
    chunks with a DYNAMIC trip count ceil(n_rows / chunk): inactive agent
    slots (all keys masked) skip their score/KV compute entirely while
    still receiving the exact zero-aggregate epilogue — outputs are
    bitwise-identical to the full computation, and runtime scales with the
    OCCUPANCY of the padded agent array instead of its capacity. Measured
    (v5e, flagship shapes): 407 us/column at 128/128 active, 346 at
    64/128, 287 at 32/128 (vs 644 us for the straight-line predecessor
    and 838 us for the XLA op-by-op column).

Math is the DenseAttention forward (model/layers.py:100-255) exactly:
fp32 LayerNorm statistics, fp32 score accumulation, masked softmax with
zero aggregate for fully-masked queries, gated update, FFN. Matmul
operands are cast to the compute dtype (bf16 under the flagship policy)
with fp32 accumulation — the MXU contract the XLA path uses. Per-head
score segmentation uses the head-selector matmul (the 128-lane axis is
never split — CLAUDE.md).

Equivalence: tests/test_column_kernel.py (fp32 interpret vs the flax
motion_column, atol 2e-5; bf16 within compute-policy noise).

Reference behavior being accelerated: the per-token-step trunk pass of
agent_decoder.py:2119-2174 (motion stage of inference()).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LN_EPS = 1e-6

# per-sublayer param tensors, in packing order. Vectors are stored [L, 1, n]
# so each grid block is a [1, n] row; matrices [L, n, m].
_VECS = ("lnd_s", "lnd_b", "lns_s", "lns_b", "bq", "bv", "lnr_s", "lnr_b",
         "bvr", "bg", "bs", "bo", "post_s", "post_b", "ffp_s", "ffp_b",
         "bf0", "bf1", "ffq_s", "ffq_b")
_MATS = ("wq", "wk", "wv", "wkr", "wvr", "wga", "wgd", "ws", "wo", "wf0",
         "wf1")
_ORDER = _VECS + _MATS
_KINDS = ("t", "pl", "aa")


def _round_up(x, m):
    return (x + m - 1) // m * m


# same selector-matrix construction as the seed kernel — one source of truth
from infgen_tpu.ops.seed_kernel import selector as head_selector  # noqa: E402


def pack_column_params(dp, L: int, dtype) -> dict:
    """Stack the L trunk layers' params per sublayer kind.

    dp: the agent_decoder param subtree (keys t_attn_{i} / pt2a_{i} /
    a2a_{i}). Matmul kernels are cast to the compute dtype; LayerNorm
    params and biases stay fp32 (flax LN computes fp32 statistics and the
    kernel adds biases to fp32 accumulators).
    """
    packed = {}
    for kind, prefix, bipartite in (("t", "t_attn", False),
                                    ("pl", "pt2a", True),
                                    ("aa", "a2a", False)):
        layers = [dp[f"{prefix}_{i}"] for i in range(L)]
        HD = layers[0]["to_s"]["kernel"].shape[1]

        def st(get, cast=False, row=False):
            arrs = [jnp.asarray(get(p)) for p in layers]
            out = jnp.stack([a[None] if row else a for a in arrs])
            return out.astype(dtype) if (cast and dtype is not None) else out

        ln_dst = (lambda p: p["prenorm_dst"]) if bipartite else \
            (lambda p: p["prenorm_src"])
        packed[kind] = dict(
            lnd_s=st(lambda p: ln_dst(p)["scale"], row=True),
            lnd_b=st(lambda p: ln_dst(p)["bias"], row=True),
            lns_s=st(lambda p: p["prenorm_src"]["scale"], row=True),
            lns_b=st(lambda p: p["prenorm_src"]["bias"], row=True),
            wq=st(lambda p: p["to_q"]["kernel"], cast=True),
            bq=st(lambda p: p["to_q"]["bias"], row=True),
            wk=st(lambda p: p["to_k"]["kernel"], cast=True),
            wv=st(lambda p: p["to_v"]["kernel"], cast=True),
            bv=st(lambda p: p["to_v"]["bias"], row=True),
            lnr_s=st(lambda p: p["prenorm_r"]["scale"], row=True),
            lnr_b=st(lambda p: p["prenorm_r"]["bias"], row=True),
            wkr=st(lambda p: p["w_kr"], cast=True),
            wvr=st(lambda p: p["w_vr"], cast=True),
            bvr=st(lambda p: p["b_vr"], row=True),
            # to_g over concat([agg, dst_n]): split kernel at row HD
            wga=st(lambda p: p["to_g"]["kernel"][:HD], cast=True),
            wgd=st(lambda p: p["to_g"]["kernel"][HD:], cast=True),
            bg=st(lambda p: p["to_g"]["bias"], row=True),
            ws=st(lambda p: p["to_s"]["kernel"], cast=True),
            bs=st(lambda p: p["to_s"]["bias"], row=True),
            wo=st(lambda p: p["to_out"]["kernel"], cast=True),
            bo=st(lambda p: p["to_out"]["bias"], row=True),
            post_s=st(lambda p: p["postnorm"]["scale"], row=True),
            post_b=st(lambda p: p["postnorm"]["bias"], row=True),
            ffp_s=st(lambda p: p["ff_prenorm"]["scale"], row=True),
            ffp_b=st(lambda p: p["ff_prenorm"]["bias"], row=True),
            wf0=st(lambda p: p["ff_0"]["kernel"], cast=True),
            bf0=st(lambda p: p["ff_0"]["bias"], row=True),
            wf1=st(lambda p: p["ff_1"]["kernel"], cast=True),
            bf1=st(lambda p: p["ff_1"]["bias"], row=True),
            ffq_s=st(lambda p: p["ff_postnorm"]["scale"], row=True),
            ffq_b=st(lambda p: p["ff_postnorm"]["bias"], row=True),
        )
    return packed


def _flatten_params(packed):
    return [packed[k][n] for k in _KINDS for n in _ORDER]


def _ln(x, s, b):
    m = x.mean(axis=-1, keepdims=True)
    v = ((x - m) ** 2).mean(axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + _LN_EPS) * s + b


def _sublayer(x, xs_full, xs_chunk, r_chunk, mask_chunk, K, P, sel, selT,
              H, d, cdt, chunk, n_rows, q_scr, agg_scr):
    """One DenseAttention forward for A queries; returns the new x (f32).

    P: dict name -> loaded param value (vectors [1, n], matrices [n, m]).
    chunk: query-chunk size (VMEM bound on the [chunk*K, D] intermediates).

    Occupancy skip (n_rows, a traced int32 scalar): per-query score/KV work
    runs as a `lax.fori_loop` over query chunks with a DYNAMIC trip count
    ceil(n_rows / chunk) — the dynamic-occupancy gating the static-shape XLA
    path cannot express. The loop body loads its chunk from refs with
    `pl.ds` (Mosaic cannot dynamic-slice values) and one loop body means
    scoped VMEM is a single chunk's footprint (predicated per-chunk blocks
    each reserve their own stack and OOM). Rows >= n_rows must have every
    key masked (inactive agent slots in the rollout); their aggregate stays
    the zeroed scratch value, so the epilogue below produces EXACTLY the
    zero-aggregate path the XLA motion_column computes for fully-masked
    rows — bitwise-identical outputs, ~(1 - occupancy) of the per-query
    compute skipped at runtime.

    x: [A, D] f32 value (the running column). xs_chunk/r_chunk/mask_chunk:
    callables c0 -> ([cq, K, D], [cq, K, D], [cq, K]) chunk loads from the
    input refs (xs_chunk is None for shared self keys, where xs_full [A, D]
    provides the key side).
    """
    A, D = x.shape
    HD = H * d
    scale = d ** -0.5
    f32 = jnp.float32
    per_query = xs_chunk is not None

    def mm(a, w):
        return jax.lax.dot_general(a.astype(cdt), w,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    dst_n = _ln(x, P["lnd_s"], P["lnd_b"])                     # [A, D] f32
    q_scr[...] = mm(dst_n, P["wq"]) + P["bq"]                  # [A, HD] f32

    if not per_query:
        src_n = _ln(xs_full, P["lns_s"], P["lns_b"])
        k_sh = mm(src_n, P["wk"])                              # [A, HD]
        v_sh = mm(src_n, P["wv"]) + P["bv"]

    agg_scr[...] = jnp.zeros(agg_scr.shape, f32)
    cq = chunk
    n_chunks = (jnp.clip(n_rows, 0, A) + cq - 1) // cq

    def body(i, carry):
        c0 = i * cq
        qc = q_scr[pl.ds(c0, cq), :]                           # [cq, HD]
        rc = r_chunk(c0).astype(f32).reshape(cq * K, D)
        rn = _ln(rc, P["lnr_s"], P["lnr_b"])
        kr = mm(rn, P["wkr"])                                  # [cq*K, HD]
        vr = mm(rn, P["wvr"]) + P["bvr"]
        if per_query:
            sc = xs_chunk(c0).astype(f32).reshape(cq * K, D)
            sn = _ln(sc, P["lns_s"], P["lns_b"])
            k_eff = mm(sn, P["wk"]) + kr
            v_eff = mm(sn, P["wv"]) + P["bv"] + vr
        else:
            k_eff = jnp.broadcast_to(k_sh[None], (cq, K, HD)) \
                .reshape(cq * K, HD) + kr
            v_eff = jnp.broadcast_to(v_sh[None], (cq, K, HD)) \
                .reshape(cq * K, HD) + vr
        # scores via the head-selector matmul (no lane split)
        t = (k_eff.reshape(cq, K, HD) * qc[:, None, :]).reshape(cq * K, HD)
        sim = jax.lax.dot_general(t.astype(f32), sel,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        sim = sim.reshape(cq, K, D)[:, :, :H] * scale          # [cq, K, H]
        mf = mask_chunk(c0)[:, :, None]                        # [cq, K, 1]
        sim = sim * mf + (1.0 - mf) * NEG_INF
        mx = sim.max(axis=1)                                   # [cq, H]
        p = jnp.exp(sim - mx[:, None, :]) * mf
        den = p.sum(axis=1)                                    # [cq, H]
        # expand head weights back to the lane axis
        pp = jnp.pad(p, ((0, 0), (0, 0), (0, D - H)))
        p_full = jax.lax.dot_general(
            pp.reshape(cq * K, D), selT, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                        # [cq*K, HD]
        den_full = jax.lax.dot_general(
            jnp.pad(den, ((0, 0), (0, D - H))), selT,
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        agg = (p_full * v_eff).reshape(cq, K, HD).sum(axis=1) \
            / jnp.maximum(den_full, 1e-30)
        agg_scr[pl.ds(c0, cq), :] = agg
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    agg = agg_scr[...]

    g = jax.nn.sigmoid(mm(agg, P["wga"]) + mm(dst_n, P["wgd"]) + P["bg"])
    s = mm(dst_n, P["ws"]) + P["bs"]
    agg = agg + g * (s - agg)
    attn_out = mm(agg, P["wo"]) + P["bo"]
    x1 = x + _ln(attn_out, P["post_s"], P["post_b"])
    h = _ln(x1, P["ffp_s"], P["ffp_b"])
    h = jnp.maximum(mm(h, P["wf0"]) + P["bf0"], 0.0)
    h = mm(h, P["wf1"]) + P["bf1"]
    return x1 + _ln(h, P["ffq_s"], P["ffq_b"])


def _kernel(H, d, cdt, chunk,
            nrows_ref, x0_ref, keys_ref, rt_ref, mt_ref, plk_ref, rpl_ref,
            mpl_ref, raa_ref, maa_ref, sel_ref, selT_ref, *rest):
    param_refs, (out_ref, x_scr, q_scr, agg_scr) = rest[:-4], rest[-4:]
    l = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(l == 0)
    def _():
        x_scr[...] = x0_ref[...].astype(f32)

    # materialize layer-l params (block leading dim 1 already sliced)
    P = {}
    it = iter(param_refs)
    for kind in _KINDS:
        P[kind] = {n: next(it)[0] for n in _ORDER}

    sel = sel_ref[...].astype(f32)
    selT = selT_ref[...].astype(f32)
    x = x_scr[...]
    nr = nrows_ref[0, 0]
    Wp, Kp, A = rt_ref.shape[1], rpl_ref.shape[1], x.shape[0]

    common = dict(sel=sel, selT=selT, H=H, d=d, cdt=cdt,
                  n_rows=nr, q_scr=q_scr, agg_scr=agg_scr)
    c_t, c_pl, c_aa = chunk
    x = _sublayer(x, None,
                  lambda c0: keys_ref[0, pl.ds(c0, c_t)],
                  lambda c0: rt_ref[pl.ds(c0, c_t)],
                  lambda c0: mt_ref[pl.ds(c0, c_t)],
                  Wp, P["t"], chunk=c_t, **common)
    x = _sublayer(x, None,
                  lambda c0: plk_ref[pl.ds(c0, c_pl)],
                  lambda c0: rpl_ref[pl.ds(c0, c_pl)],
                  lambda c0: mpl_ref[pl.ds(c0, c_pl)],
                  Kp, P["pl"], chunk=c_pl, **common)
    x = _sublayer(x, x, None,
                  lambda c0: raa_ref[pl.ds(c0, c_aa)],
                  lambda c0: maa_ref[pl.ds(c0, c_aa)],
                  A, P["aa"], chunk=c_aa, **common)

    x_scr[...] = x
    out_ref[...] = x[None]


def motion_column_kernel(packed, x0, key_stack, r_t, t_mask, pl_keys, r_pl,
                         pl_mask, r_aa, aa_mask, num_heads: int,
                         head_dim: int, compute_dtype=None, chunk: int = 64,
                         interpret=None, n_rows=None):
    """Run the full L-layer trunk column in one kernel.

    x0 [A, D]; key_stack [L, A, W, D]; r_t [A, W, D]; t_mask [A, W] bool;
    pl_keys [A, K, D]; r_pl [A, K, D]; pl_mask [A, K]; r_aa [A, A, D];
    aa_mask [A, A]. W and K are padded to multiples of 8 here; A and D
    must already be multiples of 8 / 128. Returns new_cols [L, A, D] f32
    (row l = the layer-l output, the value cached for temporal keys).

    n_rows (optional traced int32 scalar): occupancy bound — per-query work
    runs only for query chunks below it. Rows >= n_rows must have all keys
    masked (they get the exact zero-aggregate output either way); see
    _sublayer. None = compute all A rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, A, W, D = key_stack.shape
    K = pl_keys.shape[1]
    Wp, Kp = _round_up(W, 8), _round_up(K, 8)
    # _sublayer slices fixed-size query chunks; shrink until A divides
    # evenly (A=16 test configs, A=40 parity configs, flagship A=128)
    # per-sublayer query-chunk sizes: the chunk fori_loop body is the
    # scoped-VMEM unit (its [chunk*K, D] f32 intermediates must fit the
    # ~16 MB budget), so cap chunk*K at 2048 rows per sublayer; each chunk
    # must divide A and also sets the occupancy-skip resolution
    def _fit(k_keys):
        c = min(chunk, A)
        while A % c:
            c //= 2
        while c > 8 and c * k_keys > 2048:
            c //= 2
        while A % c:
            c //= 2
        return max(c, 1)
    chunks = (_fit(Wp), _fit(Kp), _fit(A))
    cdt = compute_dtype or jnp.float32
    f32 = jnp.float32
    nr = jnp.full((1, 1), A, jnp.int32) if n_rows is None else \
        jnp.asarray(n_rows, jnp.int32).reshape(1, 1)

    padW = lambda a: jnp.pad(a, ((0, 0), (0, Wp - W)) + ((0, 0),) * (a.ndim - 2))
    padWl = lambda a: jnp.pad(
        a, ((0, 0), (0, 0), (0, Wp - W)) + ((0, 0),) * (a.ndim - 3))
    padK = lambda a: jnp.pad(a, ((0, 0), (0, Kp - K)) + ((0, 0),) * (a.ndim - 2))

    keys = padWl(key_stack).astype(cdt)
    r_t_p = padW(r_t).astype(cdt)
    mt = padW(t_mask.astype(f32))
    plk = padK(pl_keys).astype(cdt)
    rpl = padK(r_pl).astype(cdt)
    mpl = padK(pl_mask.astype(f32))
    raa = r_aa.astype(cdt)
    maa = aa_mask.astype(f32)

    sel = jnp.asarray(head_selector(D, num_heads, head_dim))
    data = [nr, x0.astype(f32), keys, r_t_p, mt, plk, rpl, mpl, raa, maa,
            sel, sel.T]
    params = _flatten_params(packed)

    const = lambda a: pl.BlockSpec(a.shape, lambda l, n=a.ndim: (0,) * n)
    data_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        const(data[1]),
        pl.BlockSpec((1, A, Wp, D), lambda l: (l, 0, 0, 0)),
        *[const(a) for a in data[3:]],
    ]
    # per-layer param blocks: index the leading (layer) axis by the grid
    param_specs = [pl.BlockSpec((1,) + p.shape[1:],
                                lambda l: (l,) + (0,) * (p.ndim - 1))
                   for p in params]

    kern = functools.partial(_kernel, num_heads, head_dim, cdt, chunks)
    out = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=data_specs + param_specs,
        out_specs=pl.BlockSpec((1, A, D), lambda l: (l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, A, D), f32),
        scratch_shapes=[pltpu.VMEM((A, D), f32),
                        pltpu.VMEM((A, num_heads * head_dim), f32),
                        pltpu.VMEM((A, num_heads * head_dim), f32)],
        interpret=interpret,
    )(*data, *params)
    return out
