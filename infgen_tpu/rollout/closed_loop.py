"""Closed-loop rollout as a single `jax.lax.scan` — the flagship path.

Re-architecture of InfGenAgentDecoder.inference (agent_decoder.py:1605-2389):
the reference's 60-iteration python loop with per-step tensor growth becomes
one compiled program:

  - agent insertion = slot activation inside padded arrays (a bounded
    `lax.fori_loop`, <= insert_limit per step, with occupancy rejection),
    instead of torch.cat growth (:1920-1999)
  - incremental per-layer feature cache [L, A, T_inf, D] replaces
    feat_a_t_dict (:2133-2158): each step refreshes ONE token column
  - top-k multinomial sampling on device (:2163,1902)
  - trajectories never leave HBM until the scan finishes.

Column convention (num_historical_steps=11, SHIFT=5): token columns 0..1 hold
history; rollout step t has "current" column c = 1 + t and writes c + 1.
"""

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from infgen_tpu.config import (
    Config,
    ENTER_STATE,
    EXIT_STATE,
    INVALID_STATE,
    SHIFT,
    VALID_STATE,
)
from infgen_tpu.model import edges as E
from infgen_tpu.model.agent_decoder import INVALID_SHAPE_VALUE, SEED_TYPE, map_token_index
from infgen_tpu.ops import seed_fast as SF
from infgen_tpu.ops import refine_kernel as RFK
from infgen_tpu.ops import seed_kernel as SKN
from infgen_tpu.ops.neighbors import topk_neighbors
from infgen_tpu.ops.precision import compute_dtype_of
from infgen_tpu.ops.sampling import sample_from_topk
from infgen_tpu.utils.geometry import (
    angle_between_2d_vectors,
    heading_from_contour,
    rot_mat_2d,
    wrap_angle,
)

REFINE_A2SA_K = 24   # agent_decoder.py:2042 max_num_neighbors=24
REFINE_PL2SA_K = 32  # :2048 uses 128; 10 m radius holds far fewer map tokens


class RolloutCarry(NamedTuple):
    pos: jnp.ndarray          # [A, Ti, 2]
    head: jnp.ndarray         # [A, Ti]
    state: jnp.ndarray        # [A, Ti] int32
    token: jnp.ndarray        # [A, Ti] int32
    grid: jnp.ndarray         # [A, Ti] int32
    valid: jnp.ndarray        # [A, Ti] bool (agent_valid_mask)
    interact: jnp.ndarray     # [A, Ti] bool
    temporal: jnp.ndarray     # [A, Ti] bool
    slot_active: jnp.ndarray  # [A] bool
    type_: jnp.ndarray        # [A] int32
    shape: jnp.ndarray        # [A, 3]
    raw_feat: jnp.ndarray     # [A, Ti, D]
    cache: jnp.ndarray        # [L, A, Ti, D]
    pred_traj: jnp.ndarray    # [A, R, 2] 10 Hz
    pred_head: jnp.ndarray    # [A, R]
    pred_state: jnp.ndarray   # [A, R]
    n_inserted: jnp.ndarray   # [] int32
    rng: jnp.ndarray


def _fuse(dec, tables, token_emb, motion, head_vec, type_t, shape_t, state, grid_idx):
    grid_emb = tables["grid_table"][jnp.where(grid_idx >= 0, grid_idx,
                                              dec.grid_size)]
    return dec.fuse_features(token_emb, motion, head_vec, type_t, shape_t,
                             state, grid_emb)


def make_rollout_fn(model, cfg: Config, attr, motion_tok, map_vocab,
                    num_recurrent_steps: int = None, jit: bool = True,
                    force_insert: bool = False, debug: bool = False):
    """Build `rollout(params, scenario, rng) -> dict`.

    force_insert=True makes every insertion iteration propose an agent
    regardless of the seed-state head (the reference's DEBUG mode,
    agent_decoder.py:1888-1889) — bounds the trained-model insertion cost
    for benchmarking.
    debug=True adds per-step head logits and the initial fused features to
    the output dict (parity bisection; costs HBM, keep off in production)."""
    R = num_recurrent_steps or cfg.num_recurrent_steps_val
    assert R >= SHIFT and R % SHIFT == 0, (
        f"num_recurrent_steps is in 10 Hz frames and must be a positive "
        f"multiple of SHIFT={SHIFT}, got {R}")
    n_steps = R // SHIFT
    Ti = (R + cfg.num_historical_steps) // SHIFT
    H = (cfg.num_historical_steps - 1) // SHIFT          # 2 history columns
    A = cfg.max_agents
    D = cfg.hidden_dim
    L = cfg.num_agent_layers
    W = min(cfg.time_span // SHIFT, Ti)                  # temporal window 12
    G = attr.grid_size
    grid_xy = attr.grid                                  # [G, 2]
    import numpy as _np
    token_traj_all = _np.stack([_np.asarray(motion_tok.vocab[k]) for k in ("veh", "ped", "cyc")])

    dec_method = lambda fn: (lambda mdl, *a, **k: fn(mdl.agent_decoder, *a, **k))
    sf_dt = compute_dtype_of(cfg.compute_dtype)   # seed-fast compute dtype
    # fused single-kernel seed evaluation (ops/seed_kernel): Mosaic on TPU,
    # interpret mode on CPU (tests / multichip dryrun). The "full" variant
    # folds the per-step precompute into the kernel as well.
    use_sknf = cfg.use_seed_kernel_full and cfg.use_grid_token
    use_skn = (cfg.use_seed_kernel or cfg.use_seed_kernel_full) \
        and cfg.use_grid_token and not use_sknf
    # fused per-insert refine pass (ops/refine_kernel)
    use_refk = (cfg.use_refine_kernel and cfg.use_head_token
                and cfg.use_grid_token)
    skn_interp = jax.default_backend() != "tpu"
    skn_sel = SKN.selector(cfg.hidden_dim, cfg.num_heads, cfg.head_dim) \
        if (use_skn or use_sknf or use_refk) else None
    Gp_occ = -(-G // 128) * 128 if use_sknf else None

    def apply_dec(params, fn, *args):
        return model.apply({"params": params}, *args,
                           method=dec_method(fn))

    # ---------------------------------------------------------------- #

    def rollout(params, scenario, inputs, rng) -> Dict[str, Any]:
        from infgen_tpu.model.agent_decoder import AgentDecoder

        map_enc = model.apply({"params": params}, scenario.map,
                              map_vocab["traj_src"],
                              method=lambda m, *a: m.encode_map(*a))
        x_pt = map_enc["x_pt"]
        pt_pos = scenario.map.position
        pt_orient = scenario.map.orientation
        pt_mask = scenario.map.mask

        tables = apply_dec(params, AgentDecoder.rollout_tables, motion_tok.vocab)

        # rollout-invariant insertion state: the seed feature vector and the
        # map-token K/V projections of every pt2sa layer (x_pt never changes
        # during the rollout; per-step geometry contributions are added in
        # _insertion)
        if cfg.disable_insertion:
            seed_vec = ptkv0 = packs = None
        else:
            seed_vec = _seed_vector(params, tables)
            dp0 = params["agent_decoder"]
            ptkv0 = [SF.precompute_src_kv(dp0[f"pt2sa_{i}"], x_pt, sf_dt)
                     for i in range(cfg.num_seed_layers)]
            packs = {}
            if use_sknf:
                packs["seed"] = SKN.pack_seed_params_full(
                    dp0, cfg.num_seed_layers, G, sf_dt)
            elif use_skn:
                packs["seed"] = SKN.pack_seed_params(
                    dp0, cfg.num_seed_layers, G, sf_dt)
            if use_refk:
                packs["refine"] = RFK.pack_refine_params(
                    dp0, cfg.num_seed_layers, attr.angle_size, sf_dt)

        tok = inputs.tokens
        T0 = tok.token_idx.shape[1]

        # --- slot filtering (agent_decoder.py:1609-1662) ---
        slot_active = inputs.slot_mask & (tok.state_idx[:, H - 1] != INVALID_STATE)
        eval_mask = slot_active & scenario.agents.valid[:, cfg.num_historical_steps - 1]

        def pad_t(x, fill):
            if T0 >= Ti:
                return x[:, :Ti]
            return jnp.concatenate(
                [x, jnp.full((A, Ti - T0, *x.shape[2:]), fill, x.dtype)], axis=1)
        pos = pad_t(tok.token_pos, 0.0)
        head = pad_t(tok.token_heading, 0.0)
        state = pad_t(tok.state_idx, INVALID_STATE)
        token = pad_t(tok.token_idx, -1)
        grid = pad_t(inputs.grid_token_idx, -1)
        valid = pad_t(tok.raw_token_valid, True)

        col = jnp.arange(Ti)[None]
        fut = col >= H
        pos = jnp.where(fut[..., None], 0.0, pos)
        head = jnp.where(fut, 0.0, head)
        state = jnp.where(fut, INVALID_STATE, state)
        token = jnp.where(fut, -1, token)
        grid = jnp.where(fut, -1, grid)
        valid = jnp.where(fut, True, valid)
        valid = valid & eval_mask[:, None]

        # deactivated slots are fully inert
        state = jnp.where(slot_active[:, None], state, INVALID_STATE)
        token = jnp.where(slot_active[:, None], token, -1)
        grid = jnp.where(slot_active[:, None], grid, -1)
        pos = jnp.where(slot_active[:, None, None], pos, 0.0)

        # --- masks (agent_decoder.py:1694-1719) ---
        is_bos = state == ENTER_STATE
        is_eos = state == EXIT_STATE
        bos = jnp.where(is_bos.any(1), jnp.argmax(is_bos, 1), 0)
        eos = jnp.where(is_eos.any(1), jnp.argmax(is_eos, 1), Ti - 1)
        motion_win = (col > bos[:, None]) & (col <= eos[:, None]) & (col < H)
        temporal = jnp.where(motion_win, valid, True)
        temporal = temporal | fut  # cols >= H forced true (:1718)
        interact = jnp.ones((A, Ti), bool)
        non_motion = (~motion_win) & (col < H)
        interact = jnp.where(non_motion, False, interact)
        interact = jnp.where(state == ENTER_STATE, True, interact)
        interact = interact.at[inputs.av_index].set(True)
        interact = interact | fut
        interact = interact & slot_active[:, None]
        temporal = temporal & slot_active[:, None]

        av = inputs.av_index
        type_ = jnp.asarray(inputs.agent_type)
        shape = jnp.asarray(inputs.agent_shape)

        # --- embeddings for all rows ---
        type_t = jnp.where(state == INVALID_STATE, SEED_TYPE, type_[:, None])
        shape_t = jnp.where((state == INVALID_STATE)[..., None],
                            INVALID_SHAPE_VALUE, shape[:, None, :])

        t_idx = map_token_index(token, cfg.token_size)
        token_emb = tables["token_tables"][jnp.clip(type_, 0, 2)[:, None], t_idx]

        def fuse_all(params, token_emb, pos, head, state, type_t, shape_t, grid):
            def fn(mdl):
                d = mdl.agent_decoder
                motion, hv = E.build_motion_vectors(pos, head, state)
                return _fuse(d, tables, token_emb, motion, hv, type_t, shape_t,
                             state, grid)
            return model.apply({"params": params}, method=fn)

        raw_feat = fuse_all(params, token_emb, pos, head, state, type_t,
                            shape_t, grid)

        carry = RolloutCarry(
            pos=pos, head=head, state=state, token=token, grid=grid,
            valid=valid, interact=interact, temporal=temporal,
            slot_active=slot_active, type_=type_, shape=shape,
            raw_feat=raw_feat, cache=jnp.zeros((L, A, Ti, D), raw_feat.dtype),
            pred_traj=jnp.zeros((A, R, 2)), pred_head=jnp.zeros((A, R)),
            pred_state=jnp.zeros((A, R)), n_inserted=jnp.zeros((), jnp.int32),
            rng=rng,
        )

        # --- prefill cache column 0: the reference never queries column 0
        # (its motion inference mask is column 1+t only, :2119-2121), so its
        # cached value per layer is the zero-aggregate transform of the raw
        # fused feature — NOT an attended motion pass
        cols0 = apply_dec(params, AgentDecoder.prefill_column,
                          carry.raw_feat[:, 0])
        carry = carry._replace(cache=carry.cache.at[:, :, 0].set(cols0))

        # --- the scan ---
        def body(carry, t):
            carry, out = _step(params, carry, t, x_pt, pt_pos, pt_orient,
                               pt_mask, tables, av, slot_active, seed_vec,
                               ptkv0, packs)
            return carry, out

        raw_feat0 = carry.raw_feat
        carry, outs = jax.lax.scan(body, carry, jnp.arange(n_steps),
                                   unroll=cfg.rollout_scan_unroll)

        result = _finalize(carry, outs, scenario, inputs, slot_active, av)
        if debug:
            result["debug_token_logits"] = outs["token_logits"]
            result["debug_state_logits"] = outs["state_logits"]
            result["debug_layer_cols"] = outs["layer_cols"]
            result["debug_feat_new"] = outs["feat_new"]
            result["debug_raw_feat0"] = raw_feat0
        return result

    # ---------------------------------------------------------------- #
    # motion pass for one column
    # ---------------------------------------------------------------- #

    def _motion_pass(params, carry, c, x_pt, pt_pos, pt_orient, pt_mask,
                     tables, av):
        from infgen_tpu.model.agent_decoder import AgentDecoder

        pos_c = jax.lax.dynamic_index_in_dim(carry.pos, c, 1, False)   # [A, 2]
        head_c = jax.lax.dynamic_index_in_dim(carry.head, c, 1, False)
        state_c = jax.lax.dynamic_index_in_dim(carry.state, c, 1, False)
        inter_c = jax.lax.dynamic_index_in_dim(carry.interact, c, 1, False)
        hv_c = jnp.stack([jnp.cos(head_c), jnp.sin(head_c)], -1)

        # temporal keys: sliding window of W columns ending at c-1
        start = jnp.clip(c - W, 0, Ti - W)
        k_cols = start + jnp.arange(W)                                  # [W]
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, W, axis=1)
        key_pos = sl(carry.pos)          # [A, W, 2]
        key_head = sl(carry.head)
        key_state = sl(carry.state)
        key_hist = sl(carry.temporal)

        is_bos = carry.state == ENTER_STATE
        bos = jnp.where(is_bos.any(1), jnp.argmax(is_bos, 1), 0)        # [A]
        k_valid = (k_cols[None] < c) & key_hist & (k_cols[None] >= bos[:, None])
        k_valid = k_valid & carry.slot_active[:, None]
        if cfg.ref_rollout_quirks:
            # reference quirk: the last num_seed_feature active rows get no
            # temporal attention at inference (agent_decoder.py:553-556 slices
            # hist/inference masks by the TRAINING seed-row count; temporal
            # keys are an agent's own history, so masking keys == masking the
            # row). Active slots are always a prefix (slots fill in order), so
            # the reference's "last 10 rows" are the highest-indexed actives.
            n_act = carry.slot_active.sum()
            quirk = jnp.arange(A) >= n_act - cfg.num_seed_feature
            k_valid = k_valid & ~quirk[:, None]

        rel_pos = key_pos - pos_c[:, None]
        rel_head = wrap_angle(key_head - head_c[:, None])
        inv_k = key_state == INVALID_STATE
        inv_q = (state_c == INVALID_STATE)[:, None]
        rel_pos, rel_head = E._apply_invalid_sentinels(rel_pos, rel_head,
                                                       inv_k, inv_q)
        t_r_raw = jnp.stack([
            jnp.linalg.norm(rel_pos, axis=-1),
            angle_between_2d_vectors(hv_c[:, None], rel_pos),
            rel_head,
            (k_cols[None] - c).astype(jnp.float32) * jnp.ones((A, 1)),
        ], axis=-1)

        key_stack = jnp.concatenate([
            sl(carry.raw_feat)[None],
            jax.vmap(sl)(carry.cache[:-1]),
        ], axis=0)                                                      # [L, A, W, D]

        # a2a at column c
        km = inter_c & carry.slot_active
        d2 = ((pos_c[:, None] - pos_c[None]) ** 2).sum(-1)
        a2a_mask = (d2 <= cfg.a2a_radius ** 2) & ~jnp.eye(A, dtype=bool)
        a2a_mask = a2a_mask & km[None, :] & km[:, None]
        rel_pos_aa = pos_c[None] - pos_c[:, None]
        rel_head_aa = wrap_angle(head_c[None] - head_c[:, None])
        inv_c = state_c == INVALID_STATE
        rel_pos_aa, rel_head_aa = E._apply_invalid_sentinels(
            rel_pos_aa, rel_head_aa, inv_c[None, :], inv_c[:, None])
        a2a_r_raw = jnp.stack([
            jnp.linalg.norm(rel_pos_aa, axis=-1),
            angle_between_2d_vectors(hv_c[:, None], rel_pos_aa),
            rel_head_aa,
        ], axis=-1)

        # pl2a at column c
        idx5, val5 = topk_neighbors(pos_c, pt_pos, cfg.pl2a_num_neighbors,
                                    cfg.pl2a_radius, key_mask=pt_mask)
        val5 = val5 & km[:, None]
        rel_pl = pt_pos[idx5] - pos_c[:, None]
        rel_or = wrap_angle(pt_orient[idx5] - head_c[:, None])
        rel_pl = jnp.where(inv_c[:, None, None], E.MOTION_GAP, rel_pl)
        rel_or = jnp.where(inv_c[:, None], E.HEADING_GAP, rel_or)
        pl_r_raw = jnp.stack([
            jnp.linalg.norm(rel_pl, axis=-1),
            angle_between_2d_vectors(hv_c[:, None], rel_pl),
            rel_or,
        ], axis=-1)
        pl_keys = x_pt[idx5]

        x_c = jax.lax.dynamic_index_in_dim(carry.raw_feat, c, 1, False)
        # occupancy bound for the column kernel: 1 + highest active slot
        # index. Insertions fill the lowest free slot first (argmax(free)),
        # so rows past the bound are inactive with all key masks false — the
        # kernel skips their per-query compute with identical outputs.
        n_rows = jnp.where(carry.slot_active.any(),
                           A - jnp.argmax(carry.slot_active[::-1]),
                           0).astype(jnp.int32)
        new_cols, out = apply_dec(params, AgentDecoder.motion_column,
                                  x_c, key_stack, t_r_raw, k_valid,
                                  a2a_r_raw, a2a_mask, pl_keys, pl_r_raw,
                                  val5, n_rows)
        cache = jax.vmap(
            lambda cch, ncol: jax.lax.dynamic_update_index_in_dim(
                cch, ncol, c, 1)
        )(carry.cache, new_cols)
        carry = carry._replace(cache=cache)
        return carry, out, new_cols

    # ---------------------------------------------------------------- #
    # insertion loop for one step
    # ---------------------------------------------------------------- #

    def _insertion(params, carry, c, x_pt, pt_pos, pt_orient, pt_mask,
                   tables, av, seed_vec, ptkv0, packs):
        """Insertion for one step.

        The iteration loop carries ONLY column-c slices plus a bounded
        record buffer (`recs`, <= insert_limit rows) — never the full
        RolloutCarry. Under a vmapped rollout the `while_loop` batching rule
        selects the whole loop carry against the stop predicate on EVERY
        iteration; with the full carry inside (the [L, A, Ti, D] cache alone
        is ~12 MB) that select dominated trained-model throughput. Accepted
        insertions are scattered into the full carry once per step by
        `_apply_inserts`.
        """
        from infgen_tpu.model.agent_decoder import AgentDecoder

        ego_pos = jax.lax.dynamic_index_in_dim(carry.pos[av], c, 0, False)
        ego_head = jax.lax.dynamic_index_in_dim(carry.head[av], c, 0, False)
        ego_hv = jnp.stack([jnp.cos(ego_head), jnp.sin(ego_head)])

        # map keys within pl2seed radius of ego (shared by all iterations)
        d_pl = jnp.linalg.norm(pt_pos - ego_pos[None], axis=-1)
        pl_mask = (d_pl <= cfg.pl2seed_radius) & pt_mask
        rel_pl = pt_pos - ego_pos[None]
        pl_r_raw = jnp.stack([
            d_pl,
            angle_between_2d_vectors(ego_hv[None], rel_pl),
            wrap_angle(pt_orient - ego_head),
        ], axis=-1)

        # ---- per-step precompute for the decomposed seed evaluation
        # (ops/seed_fast.py; exact-equivalence: test_seed_fast_equivalence).
        # The reference recomputes EVERY projection per iteration; here the
        # map K/V ride in from the rollout scope (x_pt is rollout-invariant),
        # geometry contributions and agent-row projections are computed once
        # per step, and single rows are patched per insert.
        dp = params["agent_decoder"]
        L_s = cfg.num_seed_layers
        D_ = cfg.hidden_dim
        # loop-invariant map->seed geometry embedding
        r_pl_emb = apply_dec(params, AgentDecoder.embed_pl2sa_r, pl_r_raw)
        if not use_sknf:
            K_pt, V_pt = [], []
            for i in range(L_s):
                kr, vr = SF.r_contrib(dp[f"pt2sa_{i}"], r_pl_emb, sf_dt)
                K_pt.append(ptkv0[i][0] + kr)
                V_pt.append(ptkv0[i][1] + vr)
        if use_skn:
            K_pt_s, V_pt_s = jnp.stack(K_pt), jnp.stack(V_pt)
        if use_skn or use_sknf:
            maskf_pl = jnp.broadcast_to(
                pl_mask[:, None], (pl_mask.shape[0], D_)).astype(jnp.float32)
        if use_sknf:
            k0_s = jnp.stack([kv[0] for kv in ptkv0])
            v0_s = jnp.stack([kv[1] for kv in ptkv0])

        # per-step refine map-candidate subset: every insert lands within
        # pl2seed_radius of ego and its refine map keys within pl2sa_radius
        # of the insert, so all per-insert topk candidates lie within
        # (pl2seed + pl2sa) of ego. Pre-gathering the NC nearest once per
        # step shrinks the per-insert topk + gather from P to NC rows.
        # Candidates are re-sorted to ORIGINAL index order so the per-insert
        # topk tie-breaks exactly like the full-P computation whenever the
        # subset covers every in-radius token (bitwise-identical refine).
        P_ = pt_pos.shape[0]
        NC = min(cfg.refine_map_candidates or P_, P_)
        if NC < P_:
            cand_idx, cand_ok = topk_neighbors(
                ego_pos[None], pt_pos, NC,
                cfg.pl2seed_radius + cfg.pl2sa_radius, key_mask=pt_mask)
            order = jnp.argsort(jnp.where(cand_ok[0], cand_idx[0], P_))
            cand_idx = cand_idx[0][order]
            cand_ok = cand_ok[0][order]
            cand = dict(pos=pt_pos[cand_idx], orient=pt_orient[cand_idx],
                        x=x_pt[cand_idx], ok=cand_ok)
        else:
            cand = dict(pos=pt_pos, orient=pt_orient, x=x_pt, ok=pt_mask)

        # step-start occupancy / agent geometry (patched per insert)
        pos_c0 = jax.lax.dynamic_index_in_dim(carry.pos, c, 1, False)
        head_c0 = jax.lax.dynamic_index_in_dim(carry.head, c, 1, False)
        grid_c0 = jax.lax.dynamic_index_in_dim(carry.grid, c, 1, False)
        inter_c0 = jax.lax.dynamic_index_in_dim(carry.interact, c, 1, False)
        rawf_c0 = jax.lax.dynamic_index_in_dim(carry.raw_feat, c, 1, False)

        # agent-row key snapshots (zero-aggregate chains independent of the
        # seed query), once per step; only the inserted row changes. The
        # full kernel computes the chains in-kernel from the raw column.
        if not use_sknf:
            ag_keys0 = apply_dec(params, AgentDecoder.seed_key_chain, rawf_c0)
        occ_vec0 = ((jax.nn.one_hot(jnp.where(grid_c0 >= 0, grid_c0, 0), G)
                     * ((grid_c0 >= 0) & carry.slot_active)[:, None]).sum(0)
                    > 0)
        km0 = inter_c0 & carry.slot_active
        d_a0 = jnp.linalg.norm(pos_c0 - ego_pos[None], axis=-1)
        rel_a0 = pos_c0 - ego_pos[None]
        a2sa_r_raw0 = jnp.stack([
            d_a0,
            angle_between_2d_vectors(ego_hv[None], rel_a0),
            wrap_angle(head_c0 - ego_head),
        ], axis=-1)
        r_sa_emb0 = apply_dec(params, AgentDecoder.embed_a2sa_r, a2sa_r_raw0)
        if use_sknf:
            fast0 = dict(agent_col=rawf_c0,
                         r_sa=r_sa_emb0,
                         a2sa_mask=km0 & (d_a0 <= cfg.pl2seed_radius),
                         occ_vec=occ_vec0)
        else:
            K_a0, V_a0 = [], []
            for i in range(L_s):
                ka, va = SF.precompute_src_kv(dp[f"a2sa_{i}"], ag_keys0[i],
                                              sf_dt)
                kar, var_ = SF.r_contrib(dp[f"a2sa_{i}"], r_sa_emb0, sf_dt)
                K_a0.append(ka + kar)
                V_a0.append(va + var_)
            fast0 = dict(K_a=jnp.stack(K_a0), V_a=jnp.stack(V_a0),
                         a2sa_mask=km0 & (d_a0 <= cfg.pl2seed_radius),
                         occ_vec=occ_vec0)
            if cfg.use_grid_token:
                occ_emb0 = apply_dec(params, AgentDecoder.embed_occ, occ_vec0)
                fast0["v_occ"] = jnp.stack([
                    SF.occ_value(dp[f"occ2sa_{i}"], occ_emb0, sf_dt)
                    for i in range(L_s)])

        def eval_seed(slim, fast, p_used):
            """One seed-head evaluation: the reference's per-iteration seed
            stack + heads + grid-cell sampling (agent_decoder.py:1833-1905).

            Occupied-cell rejections are retried HERE with fresh multinomial
            draws instead of re-running the seed stack: the reference's
            rejection path (`continue`, :1906-1909) restores feat_a and loops
            back to an eval over IDENTICAL inputs — same logits, only the
            torch.multinomial draw differs — so one retry == one fresh draw
            from the same top-k, and each retry consumes one unit of the
            shared insert_limit budget exactly like the reference's p counter
            (:1775-1776). This keeps rejected iterations at ~4 ops instead of
            a full seed-stack + insert + refine pass, which is the difference
            between trained-model rollouts being insertion-bound or not.
            p_used: budget already consumed; returns n_draws (>= 1) in the
            proposal."""
            rng, r1 = jax.random.split(slim["rng"])
            slim = dict(slim, rng=rng)
            occ_vec = fast["occ_vec"]

            if use_sknf:
                # one fused Mosaic kernel from RAW inputs: precompute
                # (occ embedding, r contributions, key chains, agent K/V)
                # + stack + heads — identical call per step and iteration
                maskf_a = jnp.broadcast_to(
                    fast["a2sa_mask"][:, None],
                    (A, cfg.hidden_dim)).astype(jnp.float32)
                occ_row = jnp.pad(fast["occ_vec"].astype(jnp.float32),
                                  (0, Gp_occ - G))[None]
                small, posl = SKN.seed_eval_full_kernel(
                    packs["seed"], seed_vec[None].astype(jnp.float32),
                    k0_s, v0_s, r_pl_emb, maskf_pl, fast["agent_col"],
                    fast["r_sa"], maskf_a, occ_row, skn_sel,
                    cfg.num_heads, cfg.head_dim, interpret=skn_interp)
                heads = dict(state_logits=small[0, :2],
                             type_logits=small[1, :3],
                             shape=small[2, :3],
                             pos_logits=posl[0, :G])
            elif use_skn:
                # one fused Mosaic kernel for the whole stack + heads
                # (ops/seed_kernel; the rollout is dispatch-bound)
                maskf_a = jnp.broadcast_to(
                    fast["a2sa_mask"][:, None],
                    (A, cfg.hidden_dim)).astype(jnp.float32)
                small, posl = SKN.seed_eval_kernel(
                    packs["seed"], seed_vec[None].astype(jnp.float32),
                    fast["v_occ"], K_pt_s, V_pt_s, maskf_pl,
                    fast["K_a"], fast["V_a"], maskf_a, skn_sel,
                    cfg.num_heads, cfg.head_dim, interpret=skn_interp)
                heads = dict(state_logits=small[0, :2],
                             type_logits=small[1, :3],
                             shape=small[2, :3],
                             pos_logits=posl[0, :G])
            else:
                sd = seed_vec
                for i in range(L_s):
                    if cfg.use_grid_token:
                        sd = SF.attn_1q_single_key(dp[f"occ2sa_{i}"], sd,
                                                   fast["v_occ"][i], sf_dt)
                    sd = SF.attn_1q(dp[f"pt2sa_{i}"], sd, K_pt[i], V_pt[i],
                                    pl_mask, cfg.num_heads, sf_dt)
                    sd = SF.attn_1q(dp[f"a2sa_{i}"], sd, fast["K_a"][i],
                                    fast["V_a"][i], fast["a2sa_mask"],
                                    cfg.num_heads, sf_dt, bipartite=False)
                heads = apply_dec(params, AgentDecoder.seed_heads, sd)

            heads = {k: v.astype(jnp.float32) for k, v in heads.items()}
            enter_prob = jax.nn.softmax(heads["state_logits"])[1]
            if force_insert:
                want_enter = jnp.bool_(True)
            else:
                want_enter = jnp.argmax(heads["state_logits"]) == 1
            type_idx = jnp.argmax(heads["type_logits"]).astype(jnp.int32)
            shape_pred = heads["shape"]

            if cfg.use_grid_token:
                pos_probs = jax.nn.softmax(heads["pos_logits"])
                # draw ALL potential retries at once: sequential rejection
                # retries are i.i.d. draws from the same top-k (the logits
                # don't change between retries — eval_seed docstring), so
                # "first free candidate among insert_limit draws, budget
                # permitting" has the identical joint distribution of
                # (accepted cell, draws consumed) with no inner while_loop
                n_cand = max(cfg.insert_limit, 1)  # 0 only in eval-only profiling
                topk_p, topk_idx = jax.lax.top_k(pos_probs,
                                                 cfg.insert_beam_size)
                choices = jax.random.categorical(
                    r1, jnp.log(jnp.maximum(topk_p, 1e-30)),
                    shape=(n_cand,))
                g_cands = topk_idx[choices]                       # [limit]
                remaining = cfg.insert_limit - p_used
                in_budget = jnp.arange(n_cand) < remaining
                free_ok = ~occ_vec[g_cands] & in_budget
                any_free = free_ok.any()
                first = jnp.argmax(free_ok)
                g_idx = g_cands[first]
                occupied = ~any_free
                n_draws = jnp.where(any_free, first + 1,
                                    jnp.maximum(remaining, 1)).astype(jnp.int32)
                next_pos = _decode_pos(g_idx, ego_pos, ego_head)
            else:
                g_idx = jnp.int32(-1)
                next_pos = heads["pos_xy"] * cfg.pl2seed_radius + ego_pos
                occupied = jnp.bool_(False)
                n_draws = jnp.int32(1)
            # stop when the head declines or no free slot remains
            stop = ~want_enter | slim["active"].all()
            return slim, dict(enter_prob=enter_prob, type_idx=type_idx,
                              shape=shape_pred, g_idx=g_idx,
                              next_pos=next_pos, occupied=occupied,
                              n_draws=n_draws, stop=stop)

        def iter_body(loop):
            """Insert the current (free-cell) proposal, then evaluate the
            next one. The expensive insert + heading/offset refine machinery
            only executes inside this loop — a step where the seed head
            immediately declines pays exactly one seed evaluation and zero
            insert/refine passes (the reference breaks before refine the
            same way, agent_decoder.py:1914), and occupied-cell rejections
            are absorbed by eval_seed's cheap in-place retries."""
            slim, prop, n_new, probs, p, fast, recs = loop

            free = ~slim["active"]
            slot = jnp.argmax(free)
            # masked writes (belt and braces: under a vmapped rollout the
            # while_loop batching rule applies the body to already-stopped
            # elements and selects the old carry; the mask keeps the
            # discarded computation well-defined)
            do_insert = ~prop["occupied"] & ~prop["stop"]

            slim, recs, new_feat, ins_pos, ins_head = _do_insert(
                params, slim, recs, n_new, c, slot, do_insert,
                prop["next_pos"], prop["g_idx"], prop["type_idx"],
                prop["shape"], ego_pos, ego_head, cand, tables, packs)

            # ---- patch the inserted row into the fast-eval state ----
            rel = ins_pos - ego_pos
            d_row = jnp.linalg.norm(rel)
            r_row_raw = jnp.stack([
                d_row,
                angle_between_2d_vectors(ego_hv[None], rel[None])[0],
                wrap_angle(ins_head - ego_head),
            ])[None]
            r_row_emb = apply_dec(params, AgentDecoder.embed_a2sa_r, r_row_raw)
            fast = dict(fast)
            if use_sknf:
                # the full kernel recomputes chains/K/V from raw inputs:
                # only the raw feature row, its geometry embedding, the
                # mask row, and the occupancy bit change
                fast["agent_col"] = fast["agent_col"].at[slot].set(
                    jnp.where(do_insert, new_feat, fast["agent_col"][slot]))
                fast["r_sa"] = fast["r_sa"].at[slot].set(
                    jnp.where(do_insert, r_row_emb[0], fast["r_sa"][slot]))
            else:
                row_chain = apply_dec(params, AgentDecoder.seed_key_chain,
                                      new_feat[None, :])[:, 0]   # [L, D]
                K_rows, V_rows = [], []
                for i in range(L_s):
                    ka, va = SF.precompute_src_kv(dp[f"a2sa_{i}"],
                                                  row_chain[i][None], sf_dt)
                    kar, var_ = SF.r_contrib(dp[f"a2sa_{i}"], r_row_emb,
                                             sf_dt)
                    K_rows.append((ka + kar)[0])
                    V_rows.append((va + var_)[0])
                fast["K_a"] = fast["K_a"].at[:, slot].set(
                    jnp.where(do_insert, jnp.stack(K_rows),
                              fast["K_a"][:, slot]))
                fast["V_a"] = fast["V_a"].at[:, slot].set(
                    jnp.where(do_insert, jnp.stack(V_rows),
                              fast["V_a"][:, slot]))
            fast["a2sa_mask"] = fast["a2sa_mask"].at[slot].set(
                jnp.where(do_insert, d_row <= cfg.pl2seed_radius,
                          fast["a2sa_mask"][slot]))
            if cfg.use_grid_token:
                occ_vec = fast["occ_vec"].at[prop["g_idx"]].set(
                    jnp.where(do_insert, True,
                              fast["occ_vec"][prop["g_idx"]]))
                fast["occ_vec"] = occ_vec
                if not use_sknf:
                    occ_emb = apply_dec(params, AgentDecoder.embed_occ,
                                        occ_vec)
                    fast["v_occ"] = jnp.stack([
                        SF.occ_value(dp[f"occ2sa_{i}"], occ_emb, sf_dt)
                        for i in range(L_s)])

            # reference records the enter prob at index num_new_agents after a
            # successful insert (agent_decoder.py:2105)
            probs = probs.at[n_new + 1].set(
                jnp.where(do_insert, prop["enter_prob"], probs[n_new + 1]))
            n_new = n_new + do_insert.astype(jnp.int32)
            slim, prop = eval_seed(slim, fast, p)
            return slim, prop, n_new, probs, p + prop["n_draws"], fast, recs

        # while_loop (not fori): exits as soon as the seed head says stop,
        # the budget runs out, or a proposal's retries exhausted the budget
        # while occupied. Budget semantics match the reference exactly: its
        # while loop increments p at the top of EVERY iteration
        # (agent_decoder.py:1775) and breaks at p-1 >= insert_limit (:1776),
        # so each seed-stack eval — including occupied-cell rejection
        # retries, which there are full re-evals over unchanged inputs —
        # consumes one of the <=10 units; here every multinomial draw
        # consumes one unit (eval_seed docstring). Verified by
        # tests/test_rollout_parity.py insert mode: with insert_beam_size=1
        # the argmax cell repeats, both sides burn most of the budget on
        # rejections, and per-step insertion counts still match bitwise.
        # The one residual ordering difference: the reference checks
        # occupancy BEFORE the all-invalid stop (:1906 vs :1914), this loop
        # checks stop first — they diverge only when a proposal is
        # simultaneously occupied AND stop-flagged, where the reference
        # keeps burning budget on a proposal it would never insert while
        # this loop exits early (no insertion either way).
        probs0 = jnp.zeros((cfg.insert_limit + 1,))
        K_rec = max(cfg.insert_limit, 1)
        recs0 = dict(
            ok=jnp.zeros((K_rec,), bool),
            slot=jnp.zeros((K_rec,), jnp.int32),
            pos_pre=jnp.zeros((K_rec, 2)),
            pos=jnp.zeros((K_rec, 2)),
            head=jnp.zeros((K_rec,)),
            g=jnp.zeros((K_rec,), jnp.int32),
            type=jnp.zeros((K_rec,), jnp.int32),
            shape=jnp.zeros((K_rec, 3)),
            feat=jnp.zeros((K_rec, D), carry.raw_feat.dtype),
        )
        slim0 = dict(rng=carry.rng, active=carry.slot_active,
                     pos_c=pos_c0, head_c=head_c0, inter_c=inter_c0,
                     rawf_c=rawf_c0)
        slim, prop0 = eval_seed(slim0, fast0, jnp.int32(0))
        loop0 = (slim, prop0, jnp.int32(0), probs0, prop0["n_draws"], fast0,
                 recs0)

        def _running(loop):
            return ((loop[4] <= cfg.insert_limit) & ~loop[1]["stop"]
                    & ~loop[1]["occupied"])

        if cfg.insertion_fixed_trip:
            # fixed-trip form (cfg.insertion_fixed_trip docstring): exactly
            # insert_limit iterations, stopped state frozen by a full-state
            # select — the same select the while_loop batching rule performs
            # per lane under vmap, so results are bitwise-identical
            # (tests/test_rollout.py::test_rollout_fixed_trip_ab)
            def fixed_body(_, loop):
                run = _running(loop)
                new = iter_body(loop)
                return jax.tree.map(
                    lambda x, y: jnp.where(run, x, y), new, loop)

            out_loop = jax.lax.fori_loop(0, cfg.insert_limit, fixed_body,
                                         loop0)
        else:
            out_loop = jax.lax.while_loop(_running, iter_body, loop0)
        slim, _, n_new, probs, _, _, recs = out_loop
        carry = _apply_inserts(carry, slim, recs, n_new, c, ego_head)
        return carry, n_new, probs

    def _decode_pos(g_idx, ego_pos, ego_head):
        centered = jnp.asarray(grid_xy)[g_idx]
        rot = rot_mat_2d(ego_head - jnp.pi / 2)
        return centered @ rot + ego_pos

    def _seed_vector(params, tables):
        def fn(mdl):
            d = mdl.agent_decoder
            motion = jnp.full((1, 2), E.INVALID_MOTION_VALUE)
            hv = jnp.array([[1.0, 0.0]])
            return d.fuse_features(
                tables["no_token"][None], motion, hv,
                jnp.array([SEED_TYPE]), jnp.full((1, 3), INVALID_SHAPE_VALUE),
                jnp.array([INVALID_STATE]),
                tables["grid_table"][G // 2][None])[0]
        return model.apply({"params": params}, method=fn)

    def _do_insert(params, slim, recs, n_new, c, slot, do_insert, next_pos,
                   g_idx, type_idx, shape_pred, ego_pos, ego_head, cand,
                   tables, packs=None):
        """Refine + record one insertion against the slim column-c loop
        state; every write is masked by `do_insert` (no cond). Full-carry
        row writes (agent_decoder.py:1920-1999) are deferred to
        `_apply_inserts` after the loop."""
        from infgen_tpu.model.agent_decoder import AgentDecoder

        msk = lambda new, old: jnp.where(do_insert, new, old)

        # column-slice activation at the pre-refine pose (:1930-1958)
        active = slim["active"].at[slot].set(msk(True, slim["active"][slot]))
        pos_c = slim["pos_c"].at[slot].set(msk(next_pos, slim["pos_c"][slot]))
        head_c = slim["head_c"].at[slot].set(
            msk(ego_head, slim["head_c"][slot]))
        inter_c = slim["inter_c"].at[slot].set(
            msk(True, slim["inter_c"][slot]))
        onehot = jnp.arange(A) == slot

        # ---- heading/offset refine (agent_decoder.py:2001-2074) on the
        # inserted agent's SUBGRAPH: only its row is read downstream and rows
        # outside its neighbor set cannot influence it, so the pass runs on
        # [1 + K] gathered rows instead of all A (refine_column_sub)

        # pre-refine feature at the enter column (ego heading as dummy)
        col_feat = _insert_col_feat(params, tables, next_pos, ego_head,
                                    g_idx, type_idx, shape_pred)

        slot_pos = pos_c[slot]
        slot_head = head_c[slot]
        slot_hv = jnp.stack([jnp.cos(slot_head), jnp.sin(slot_head)])
        key_ok = inter_c & active & ~onehot
        idx_a, val_a = topk_neighbors(slot_pos[None], pos_c, REFINE_A2SA_K,
                                      cfg.a2sa_radius, key_mask=key_ok)
        idx_a, val_a = idx_a[0], val_a[0]                 # [Ka]
        rel = pos_c[idx_a] - slot_pos[None]
        r_aa = jnp.stack([
            jnp.linalg.norm(rel, axis=-1),
            angle_between_2d_vectors(slot_hv[None], rel),
            wrap_angle(head_c[idx_a] - slot_head),
        ], axis=-1)
        idx_p, val_p = topk_neighbors(slot_pos[None], cand["pos"],
                                      REFINE_PL2SA_K, cfg.pl2sa_radius,
                                      key_mask=cand["ok"])
        idx_p, val_p = idx_p[0], val_p[0]                 # [Km]
        rel_p = cand["pos"][idx_p] - slot_pos[None]
        r_pp = jnp.stack([
            jnp.linalg.norm(rel_p, axis=-1),
            angle_between_2d_vectors(slot_hv[None], rel_p),
            wrap_angle(cand["orient"][idx_p] - slot_head),
        ], axis=-1)

        x_sub = jnp.concatenate([col_feat[None], slim["rawf_c"][idx_a]],
                                axis=0)
        if use_refk:
            # one fused Mosaic kernel for the whole refine pass
            # (ops/refine_kernel); relation embeddings computed here, the
            # attention/zero-agg/heads inside the kernel
            D_ = cfg.hidden_dim
            R_ = REFINE_PL2SA_K                   # 32 rows: 1+24 padded
            r_pl_e = apply_dec(params, AgentDecoder.embed_pl2a_r, r_pp)
            r_aa_e = apply_dec(params, AgentDecoder.embed_a2a_r, r_aa)
            x_pad = jnp.zeros((R_, D_), x_sub.dtype).at[:x_sub.shape[0]].set(
                x_sub)
            raa_pad = jnp.zeros((R_, D_), r_aa_e.dtype).at[1:1 + r_aa_e.shape[0]
                                                           ].set(r_aa_e)
            mpl_f = jnp.broadcast_to(val_p[:, None],
                                     (R_, D_)).astype(jnp.float32)
            ma_row = jnp.zeros((R_,), bool).at[1:1 + val_a.shape[0]].set(val_a)
            ma_f = jnp.broadcast_to(ma_row[:, None],
                                    (R_, D_)).astype(jnp.float32)
            out2 = RFK.refine_kernel(
                packs["refine"], x_pad.astype(jnp.float32), cand["x"][idx_p],
                r_pl_e, mpl_f, raa_pad, ma_f, skn_sel,
                cfg.num_heads, cfg.head_dim, interpret=skn_interp)
            heads = dict(head_logits=out2[0, :attr.angle_size],
                         offset_xy=jnp.tanh(out2[1, :2]) * 2.0)
        else:
            refined_slot = apply_dec(params, AgentDecoder.refine_column_sub,
                                     x_sub, cand["x"][idx_p], r_pp, val_p, r_aa,
                                     val_a)
            heads = apply_dec(params, AgentDecoder.refine_heads, refined_slot)
            heads = {k: v.astype(jnp.float32) for k, v in heads.items()}

        if cfg.use_head_token:
            h_idx = jnp.argmax(heads["head_logits"]).astype(jnp.int32)
            new_head = wrap_angle(_decode_heading(h_idx) + ego_head)
        else:
            new_head = heads["head_theta"] * jnp.pi + ego_head
        new_pos = next_pos + (heads["offset_xy"] if cfg.use_grid_token else 0.0)

        # refined pose into the slim column state (next iterations' refine
        # neighbors see it, matching the reference's in-place row update)
        pos_c = pos_c.at[slot].set(msk(new_pos, pos_c[slot]))
        head_c = head_c.at[slot].set(msk(new_head, head_c[slot]))

        # final feature with the refined pose at the enter column only
        # (later columns are refreshed by each motion step; earlier columns
        # are masked by the temporal bos clamp)
        final_feat = _insert_col_feat(params, tables, new_pos, new_head,
                                      g_idx, type_idx, shape_pred)
        new_row_c = jnp.where(do_insert, final_feat, slim["rawf_c"][slot])
        rawf_c = slim["rawf_c"].at[slot].set(new_row_c)
        slim = dict(slim, active=active, pos_c=pos_c, head_c=head_c,
                    inter_c=inter_c, rawf_c=rawf_c)

        # record the accepted insertion for the post-loop scatter (record
        # index n_new: each accept bumps n_new, so indices never collide)
        rec = lambda a, v: a.at[n_new].set(
            jnp.where(do_insert, jnp.asarray(v, a.dtype), a[n_new]))
        recs = dict(
            ok=rec(recs["ok"], True),
            slot=rec(recs["slot"], slot),
            pos_pre=rec(recs["pos_pre"], next_pos),
            pos=rec(recs["pos"], new_pos),
            head=rec(recs["head"], new_head),
            g=rec(recs["g"], g_idx),
            type=rec(recs["type"], type_idx),
            shape=rec(recs["shape"], shape_pred),
            feat=rec(recs["feat"], final_feat),
        )
        return slim, recs, new_row_c, new_pos, new_head

    def _apply_inserts(carry, slim, recs, n_new, c, ego_head):
        """Scatter the <= insert_limit accepted insertions of one step into
        the full rollout carry in one vectorized pass (reference row writes
        agent_decoder.py:1920-1999 + pred placeholders :1965-1968). Records
        with ok=False scatter to row index A and are dropped."""
        K = recs["ok"].shape[0]
        Ti_ = carry.pos.shape[1]
        colr = jnp.arange(Ti_)
        s = jnp.where(recs["ok"], recs["slot"], A)
        drop = dict(mode="drop")
        carry = carry._replace(
            pos=carry.pos.at[s, c].set(recs["pos"], **drop),
            head=carry.head.at[s, c].set(recs["head"], **drop),
            state=carry.state.at[s, c].set(ENTER_STATE, **drop),
            # -2 at the enter column = bos sentinel (token emb -> bos row);
            # the rest of the row is already -1 (inactive-slot init)
            token=carry.token.at[s, c].set(-2, **drop),
            grid=carry.grid.at[s, c].set(recs["g"], **drop),
            valid=carry.valid.at[s].set(
                jnp.broadcast_to(colr > c, (K, Ti_)), **drop),
            interact=carry.interact.at[s].set(
                jnp.broadcast_to(colr >= c, (K, Ti_)), **drop),
            temporal=carry.temporal.at[s].set(
                jnp.ones((K, Ti_), bool), **drop),
            slot_active=slim["active"],
            type_=carry.type_.at[s].set(recs["type"], **drop),
            shape=carry.shape.at[s].set(recs["shape"], **drop),
            raw_feat=carry.raw_feat.at[s, c].set(
                recs["feat"].astype(carry.raw_feat.dtype), **drop),
            n_inserted=carry.n_inserted + n_new,
            rng=slim["rng"],
        )

        # pred placeholders for the elapsed segment (:1965-1968): pre-refine
        # pose, ego heading, ENTER state
        t_step = c - 1                 # rollout step index (c = 1 + t)
        seg = jnp.clip((t_step - 1) * SHIFT, 0, R - SHIFT)
        s_pred = jnp.where(recs["ok"] & (t_step > 0), recs["slot"], A)
        cols = (seg + jnp.arange(SHIFT))[None]             # [1, SHIFT]
        carry = carry._replace(
            pred_traj=carry.pred_traj.at[s_pred[:, None], cols].set(
                jnp.broadcast_to(recs["pos_pre"][:, None], (K, SHIFT, 2)),
                **drop),
            pred_head=carry.pred_head.at[s_pred[:, None], cols].set(
                jnp.broadcast_to(ego_head, (K, SHIFT)), **drop),
            pred_state=carry.pred_state.at[s_pred[:, None], cols].set(
                jnp.full((K, SHIFT), ENTER_STATE, carry.pred_state.dtype),
                **drop),
        )
        return carry

    def _decode_heading(idx):
        return (idx * cfg.angle_interval - 180.0) / 360.0 * (2 * jnp.pi)

    def _insert_col_feat(params, tables, pos_c_slot, head_c_slot, g_idx,
                         type_idx, shape_pred):
        """Fused feature of the inserted agent at its enter column only.

        Only this column is ever read for the new row: pre-bos columns are
        masked by the temporal bos clamp, and later columns are refreshed by
        each motion step. Enter-column semantics: motion = MOTION_GAP, bos
        token emb, enter state (agent_decoder.py:2085-2096).
        """
        def fn(mdl):
            d = mdl.agent_decoder
            motion = jnp.full((1, 2), E.MOTION_GAP)
            hv = jnp.stack([jnp.cos(head_c_slot), jnp.sin(head_c_slot)])[None]
            return _fuse(d, tables, tables["bos_token"][None], motion, hv,
                         jnp.asarray([type_idx]), shape_pred[None],
                         jnp.asarray([ENTER_STATE]), jnp.asarray([g_idx]))[0]
        return model.apply({"params": params}, method=fn)

    # ---------------------------------------------------------------- #
    # one scan step
    # ---------------------------------------------------------------- #

    def _step(params, carry, t, x_pt, pt_pos, pt_orient, pt_mask, tables, av,
              init_active, seed_vec, ptkv0, packs):
        from infgen_tpu.model.agent_decoder import AgentDecoder

        c = t + 1  # current column

        # 1. insertion (skipped at t=0, agent_decoder.py:1776)
        if cfg.disable_insertion:
            n_new = jnp.int32(0)
            seed_probs = jnp.zeros((cfg.insert_limit + 1,))
        else:
            carry, n_new, seed_probs = jax.lax.cond(
                t > 0,
                lambda cr: _insertion(params, cr, c, x_pt, pt_pos, pt_orient,
                                      pt_mask, tables, av, seed_vec, ptkv0,
                                      packs),
                lambda cr: (cr, jnp.int32(0),
                            jnp.zeros((cfg.insert_limit + 1,))),
                carry)

        # 2. motion for all agents
        carry, feat_c, layer_cols = _motion_pass(
            params, carry, c, x_pt, pt_pos, pt_orient, pt_mask, tables, av)
        token_logits, state_logits = apply_dec(
            params, AgentDecoder.motion_heads, feat_c)

        rng, r_tok = jax.random.split(carry.rng)
        carry = carry._replace(rng=rng)

        token_logits = token_logits.astype(jnp.float32)
        state_logits = state_logits.astype(jnp.float32)
        probs = jax.nn.softmax(token_logits, axis=-1)
        next_token = sample_from_topk(r_tok, probs, cfg.motion_beam_size)

        next_state = jnp.argmax(state_logits, axis=-1).astype(jnp.int32)
        next_state = jnp.where(next_state == 2, EXIT_STATE, next_state)
        next_state = next_state.at[av].set(VALID_STATE)
        if not cfg.use_state_token:
            next_state = jnp.where(next_state == EXIT_STATE, VALID_STATE,
                                   next_state)
        if cfg.disable_insertion:
            next_state = jnp.full_like(next_state, VALID_STATE)
        next_state = jnp.where(carry.slot_active, next_state, INVALID_STATE)

        # 3. de-tokenize: contour trajectory in world frame (:2176-2211)
        pos_c = jax.lax.dynamic_index_in_dim(carry.pos, c, 1, False)
        head_c = jax.lax.dynamic_index_in_dim(carry.head, c, 1, False)
        # direct (type, token) gather: materializing the per-agent vocab
        # first would read 50MB/step from HBM
        tokc = jnp.asarray(token_traj_all)[
            jnp.clip(carry.type_, 0, 2), jnp.clip(next_token, 0)]  # [A, 6, 4, 2]
        rot = rot_mat_2d(head_c)
        world = jnp.einsum("asci,aij->ascj", tokc, rot) + pos_c[:, None, None, :]

        seg_traj = world[:, 1:].mean(axis=2)                    # [A, 5, 2]
        seg_head = heading_from_contour(world[:, 1:])           # [A, 5]

        is_invalid = next_state == INVALID_STATE
        new_pos = jnp.where(is_invalid[:, None], 0.0, world[:, -1].mean(axis=1))
        new_head = jnp.where(is_invalid, 0.0, heading_from_contour(world[:, -1]))

        # ego-relative grid for the new column (:2213-2218)
        g_new, _ = attr.encode_pos(new_pos, new_pos[av][None], new_head[av])
        g_new = jnp.where(is_invalid | ~carry.slot_active, -1,
                          g_new.astype(jnp.int32))
        tok_new = jnp.where(is_invalid, -1, next_token.astype(jnp.int32))

        upd = lambda arr, v: jax.lax.dynamic_update_index_in_dim(arr, v, c + 1, 1)
        valid_next = jax.lax.dynamic_index_in_dim(carry.valid, c + 1, 1, False)
        inter_next = jax.lax.dynamic_index_in_dim(carry.interact, c + 1, 1, False)
        carry = carry._replace(
            pos=upd(carry.pos, new_pos),
            head=upd(carry.head, new_head),
            state=upd(carry.state, next_state),
            token=upd(carry.token, tok_new),
            grid=upd(carry.grid, g_new),
            valid=upd(carry.valid, jnp.where(is_invalid, False, valid_next)),
            interact=upd(carry.interact,
                         jnp.where(is_invalid, False, inter_next)),
        )

        # token / categorical embeddings at c+1 (:2233-2262)
        t_idx = map_token_index(tok_new, cfg.token_size)
        tok_emb_new = tables["token_tables"][jnp.clip(carry.type_, 0, 2), t_idx]

        # reference quirk 2 (Config.ref_rollout_quirks): initial agents keep
        # seed-type/invalid-shape categorical embeddings on every rollout
        # column (agent_decoder.py:376-380 initializes future columns as
        # invalid and :2237-2238 only ever rewrites rows that went invalid);
        # agents inserted during the rollout carry real type/shape
        # (:1949,1993).
        if cfg.ref_rollout_quirks:
            as_seed = is_invalid | init_active
        else:
            as_seed = is_invalid

        def cats(mdl):
            d = mdl.agent_decoder
            te = d.type_a_emb(jnp.where(as_seed, SEED_TYPE, carry.type_))
            se = d.shape_emb(jnp.where(as_seed[:, None],
                                       INVALID_SHAPE_VALUE, carry.shape))
            return te, se
        te_new, se_new = model.apply({"params": params}, method=cats)

        # 4. refresh fused features at c+1 (:2264-2287, incremental)
        pos_pair = jax.lax.dynamic_slice_in_dim(carry.pos, c, 2, 1)
        motion_new = pos_pair[:, 1] - pos_pair[:, 0]
        state_new = next_state
        inv_new = state_new == INVALID_STATE
        motion_new = jnp.where(inv_new[:, None], E.INVALID_MOTION_VALUE,
                               motion_new)
        prev_inv = jax.lax.dynamic_index_in_dim(carry.state, c, 1,
                                                False) == INVALID_STATE
        motion_new = jnp.where((prev_inv & ~inv_new)[:, None], E.MOTION_GAP,
                               motion_new)
        motion_new = jnp.where((~prev_inv & inv_new)[:, None], -E.MOTION_GAP,
                               motion_new)
        hv_new = jnp.stack([jnp.cos(new_head), jnp.sin(new_head)], -1)

        def fuse_col(mdl):
            d = mdl.agent_decoder
            grid_emb = tables["grid_table"][jnp.where(g_new >= 0, g_new, G)]
            feat = jnp.stack([
                jnp.linalg.norm(motion_new, axis=-1),
                angle_between_2d_vectors(hv_new, motion_new),
            ], axis=-1)
            x_a = d.x_a_emb(feat, categorical_embs=[te_new, se_new])
            s_a = d.state_a_emb(state_new)
            parts = [tok_emb_new, x_a, s_a]
            if cfg.use_grid_token:
                parts.append(grid_emb)
            return d.fusion_emb(jnp.concatenate(parts, axis=-1))
        feat_new = model.apply({"params": params}, method=fuse_col)
        carry = carry._replace(raw_feat=upd(carry.raw_feat, feat_new))

        # 5. write 10 Hz predictions for this segment
        seg = t * SHIFT
        wseg = lambda arr, v: jax.lax.dynamic_update_slice_in_dim(arr, v, seg, 1)
        carry = carry._replace(
            pred_traj=wseg(carry.pred_traj, seg_traj),
            pred_head=wseg(carry.pred_head, seg_head),
            pred_state=wseg(carry.pred_state,
                            jnp.repeat(next_state[:, None], SHIFT, 1).astype(
                                carry.pred_state.dtype)),
        )

        out = dict(n_inserted=n_new, seed_probs=seed_probs,
                   next_token=tok_new, next_state=next_state)
        if debug:
            out["token_logits"] = token_logits
            out["state_logits"] = state_logits
            out["layer_cols"] = layer_cols
            out["feat_new"] = feat_new
        return carry, out

    # ---------------------------------------------------------------- #
    # outputs
    # ---------------------------------------------------------------- #

    def _finalize(carry, outs, scenario, inputs, init_active, av):
        Hs = cfg.num_historical_steps
        A_ = carry.pos.shape[0]
        pred_traj = jnp.concatenate(
            [jnp.zeros((A_, Hs, 2)), carry.pred_traj], axis=1)
        pred_head = jnp.concatenate([jnp.zeros((A_, Hs)), carry.pred_head], 1)
        pred_state = jnp.concatenate([jnp.zeros((A_, Hs)), carry.pred_state], 1)

        # stitch history from tokens (agent_decoder.py:2311-2335)
        hist_tok = jnp.clip(inputs.tokens.token_idx[:, :H], 0)
        htraj = jnp.asarray(token_traj_all)[
            jnp.clip(carry.type_, 0, 2)[:, None], hist_tok]     # [A, H, 6, 4, 2]
        init_theta = inputs.tokens.token_heading[:, 0]
        rot = rot_mat_2d(init_theta)
        htraj = jnp.einsum("ahsci,aij->ahscj", htraj, rot) + \
            inputs.tokens.token_pos[:, 0][:, None, None, None, :]
        hist_xy = htraj[:, :, 1:].mean(axis=3).reshape(A_, H * SHIFT, 2)
        hist_hd = heading_from_contour(htraj[:, :, 1:]).reshape(A_, H * SHIFT)
        pred_traj = pred_traj.at[:, 1:Hs].set(
            jnp.where(init_active[:, None, None], hist_xy, 0.0))
        pred_head = pred_head.at[:, 1:Hs].set(
            jnp.where(init_active[:, None], hist_hd, 0.0))
        pred_traj = pred_traj.at[:, 0].set(
            jnp.where(init_active[:, None],
                      scenario.agents.position[:, 0, :2], 0.0))
        pred_head = pred_head.at[:, 0].set(
            jnp.where(init_active, scenario.agents.heading[:, 0], 0.0))
        hist_state = jnp.repeat(inputs.tokens.state_idx[:, :H], SHIFT, axis=1)
        pred_state = pred_state.at[:, 1:Hs].set(
            jnp.where(init_active[:, None], hist_state.astype(pred_state.dtype), 0.0))

        pred_valid = (pred_state != INVALID_STATE) & (pred_state != ENTER_STATE)

        eval_shape = jnp.stack([
            jnp.where(carry.type_ == 0, 4.3, jnp.where(carry.type_ == 1, 0.5, 1.9)),
            jnp.where(carry.type_ == 0, 1.8, jnp.where(carry.type_ == 1, 0.5, 0.5)),
            jnp.ones_like(carry.type_, jnp.float32),
        ], axis=-1)

        return dict(
            av_index=av,
            slot_active=carry.slot_active,
            valid_mask=carry.valid,
            pos_a=carry.pos,
            head_a=carry.head,
            pred_traj=pred_traj,
            pred_head=pred_head,
            pred_state=pred_state,
            pred_valid=pred_valid,
            pred_type=carry.type_,
            pred_shape=carry.shape,
            eval_shape=eval_shape,
            # history columns keep the raw -2 bos sentinel (the reference
            # passes agent_token_index through, :1733-1735); rollout columns
            # map it to -1 (the reference pads inserted rows with -1, :2304)
            next_token_idx=jnp.where(
                (carry.token == -2) & (jnp.arange(carry.token.shape[1])[None] >= H),
                -1, carry.token),
            next_state_idx=carry.state,
            grid_index=carry.grid,
            n_inserted=carry.n_inserted,
            per_step_inserted=outs["n_inserted"],
            seed_probs=outs["seed_probs"],
        )

    if jit:
        return jax.jit(rollout)
    return rollout
