"""ops/column_kernel: the single-dispatch whole-trunk-column kernel must
reproduce AgentDecoder.motion_column exactly at fp32 (interpret mode on
CPU), including zero-aggregate rows (fully masked queries) and the W/K
padding the wrapper applies."""

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.model.agent_decoder import AgentDecoder
from infgen_tpu.ops import column_kernel as CK


def test_column_kernel_equivalence():
    cfg = Config(max_agents=16, max_map_tokens=32, hidden_dim=32, num_heads=2,
                 head_dim=16, num_freq_bands=8, num_agent_layers=3,
                 num_seed_layers=1, num_map_layers=1, dropout=0.0,
                 time_span=12, remat_attention=False)
    attr_grid = np.zeros((4, 2), np.float32)
    dec = AgentDecoder(cfg, grid_xy=attr_grid, grid_size=4, angle_size=4)
    rng = np.random.default_rng(31)
    A, D, W, L = 16, 32, 12, 3
    K = cfg.pl2a_num_neighbors
    x_c = jnp.asarray(rng.normal(size=(A, D)), jnp.float32)
    key_stack = jnp.asarray(rng.normal(size=(L, A, W, D)), jnp.float32)
    t_r_raw = jnp.asarray(rng.normal(size=(A, W, 4)), jnp.float32)
    t_mask = jnp.asarray(rng.uniform(size=(A, W)) < 0.7)
    t_mask = t_mask.at[3].set(False)          # fully-masked query row
    a2a_r_raw = jnp.asarray(rng.normal(size=(A, A, 3)), jnp.float32)
    a2a_mask = jnp.asarray(rng.uniform(size=(A, A)) < 0.4)
    a2a_mask = a2a_mask.at[7].set(False)
    pl_keys = jnp.asarray(rng.normal(size=(A, K, D)), jnp.float32)
    pl_r_raw = jnp.asarray(rng.normal(size=(A, K, 3)), jnp.float32)
    pl_mask = jnp.asarray(rng.uniform(size=(A, K)) < 0.8)
    pl_mask = pl_mask.at[3].set(False)

    def fwd(mdl):
        # embed relations once, then run both the module stack and return
        # the embeddings for the kernel call
        r_t = mdl.r_t_emb(t_r_raw)
        r_aa = mdl.r_a2a_emb(a2a_r_raw)
        r_pl = mdl.r_pt2a_emb(pl_r_raw)
        cols, out = mdl.motion_column(x_c, key_stack, t_r_raw, t_mask,
                                      a2a_r_raw, a2a_mask, pl_keys, pl_r_raw,
                                      pl_mask)
        return cols, out, (r_t, r_aa, r_pl)

    variables = dec.init(jax.random.PRNGKey(0), method=fwd)
    ref_cols, ref_out, (r_t, r_aa, r_pl) = dec.apply(variables, method=fwd)

    packed = CK.pack_column_params(variables["params"], L, None)
    got = CK.motion_column_kernel(
        packed, x_c, key_stack, r_t, t_mask, pl_keys, r_pl, pl_mask,
        r_aa, a2a_mask, cfg.num_heads, cfg.head_dim, compute_dtype=None,
        chunk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_cols),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got[-1]), np.asarray(ref_out),
                               atol=2e-5, rtol=2e-5)

    # default chunk (64) > A=16: the wrapper must shrink it to divide A
    # evenly (the model call site passes no chunk)
    got_def = CK.motion_column_kernel(
        packed, x_c, key_stack, r_t, t_mask, pl_keys, r_pl, pl_mask,
        r_aa, a2a_mask, cfg.num_heads, cfg.head_dim, compute_dtype=None,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_def), np.asarray(ref_cols),
                               atol=2e-5, rtol=2e-5)


def test_column_kernel_occupancy_skip():
    """n_rows (occupancy bound) must be a pure runtime optimization: with
    all key masks false for rows >= n_rows (inactive slots), the kernel's
    skipped chunks produce the exact zero-aggregate epilogue the full
    computation produces — outputs bitwise-equal to n_rows=None, for every
    bound and under vmap with per-element bounds."""
    cfg = Config(max_agents=16, max_map_tokens=32, hidden_dim=32, num_heads=2,
                 head_dim=16, num_freq_bands=8, num_agent_layers=2,
                 num_seed_layers=1, num_map_layers=1, dropout=0.0,
                 time_span=12, remat_attention=False)
    attr_grid = np.zeros((4, 2), np.float32)
    dec = AgentDecoder(cfg, grid_xy=attr_grid, grid_size=4, angle_size=4)
    rng = np.random.default_rng(7)
    A, D, W, L = 16, 32, 12, 2
    K = cfg.pl2a_num_neighbors
    x_c = jnp.asarray(rng.normal(size=(A, D)), jnp.float32)
    key_stack = jnp.asarray(rng.normal(size=(L, A, W, D)), jnp.float32)
    t_r_raw = jnp.asarray(rng.normal(size=(A, W, 4)), jnp.float32)
    a2a_r_raw = jnp.asarray(rng.normal(size=(A, A, 3)), jnp.float32)
    pl_keys = jnp.asarray(rng.normal(size=(A, K, D)), jnp.float32)
    pl_r_raw = jnp.asarray(rng.normal(size=(A, K, 3)), jnp.float32)

    def fwd(mdl):
        # run motion_column once so init creates the attention-layer params
        mdl.motion_column(x_c, key_stack, t_r_raw,
                          jnp.ones((A, W), bool), a2a_r_raw,
                          jnp.ones((A, A), bool), pl_keys, pl_r_raw,
                          jnp.ones((A, K), bool))
        return (mdl.r_t_emb(t_r_raw), mdl.r_a2a_emb(a2a_r_raw),
                mdl.r_pt2a_emb(pl_r_raw))

    variables = dec.init(jax.random.PRNGKey(0), method=fwd)
    r_t, r_aa, r_pl = dec.apply(variables, method=fwd)
    packed = CK.pack_column_params(variables["params"], L, None)

    for n_act in (4, 8, 11, 16):
        act = jnp.arange(A) < n_act
        t_mask = jnp.asarray(rng.uniform(size=(A, W)) < 0.7) & act[:, None]
        pl_mask = jnp.asarray(rng.uniform(size=(A, K)) < 0.8) & act[:, None]
        a2a_mask = (jnp.asarray(rng.uniform(size=(A, A)) < 0.4)
                    & act[:, None] & act[None, :]
                    & ~jnp.eye(A, dtype=bool))
        kw = dict(num_heads=cfg.num_heads, head_dim=cfg.head_dim,
                  compute_dtype=None, chunk=4, interpret=True)
        full = CK.motion_column_kernel(
            packed, x_c, key_stack, r_t, t_mask, pl_keys, r_pl, pl_mask,
            r_aa, a2a_mask, **kw)
        skip = CK.motion_column_kernel(
            packed, x_c, key_stack, r_t, t_mask, pl_keys, r_pl, pl_mask,
            r_aa, a2a_mask, n_rows=jnp.int32(n_act), **kw)
        assert np.array_equal(np.asarray(full), np.asarray(skip)), n_act
        # vmapped with per-element bounds (the batched rollout path)
        vm = jax.vmap(lambda nr: CK.motion_column_kernel(
            packed, x_c, key_stack, r_t, t_mask, pl_keys, r_pl, pl_mask,
            r_aa, a2a_mask, n_rows=nr, **kw))
        outs = vm(jnp.asarray([n_act, A], jnp.int32))
        assert np.array_equal(np.asarray(outs[0]), np.asarray(full))
        assert np.array_equal(np.asarray(outs[1]), np.asarray(full))
