"""ops/refine_kernel: the fused per-insert refine pass must reproduce
refine_column_sub + refine_heads exactly at fp32 (interpret mode on CPU),
including the zero-aggregate neighbor rows, the padded key rows, and
fully-masked key sets."""

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.model.agent_decoder import AgentDecoder
from infgen_tpu.ops import refine_kernel as RK


def test_refine_kernel_equivalence():
    cfg = Config(max_agents=16, max_map_tokens=32, hidden_dim=32, num_heads=2,
                 head_dim=16, num_freq_bands=8, num_agent_layers=3,
                 num_seed_layers=3, num_map_layers=1, dropout=0.0,
                 grid_range=60.0, grid_interval=3.0, angle_interval=3.0,
                 remat_attention=False)
    attr_grid = np.zeros((4, 2), np.float32)
    angle_size = 120
    dec = AgentDecoder(cfg, grid_xy=attr_grid, grid_size=4,
                       angle_size=angle_size)
    rng = np.random.default_rng(59)
    D = 32
    Ka, Km, R = 24, 32, 32
    x_sub = jnp.asarray(rng.normal(size=(1 + Ka, D)), jnp.float32)
    pl_keys = jnp.asarray(rng.normal(size=(Km, D)), jnp.float32)
    pl_r_raw = jnp.asarray(rng.normal(size=(Km, 3)), jnp.float32)
    pl_mask = jnp.asarray(rng.uniform(size=Km) < 0.7)
    a2a_r_raw = jnp.asarray(rng.normal(size=(Ka, 3)), jnp.float32)
    a2a_mask = jnp.asarray(rng.uniform(size=Ka) < 0.6)

    def fwd(mdl):
        r_pl = mdl.embed_pl2a_r(pl_r_raw)
        r_aa = mdl.embed_a2a_r(a2a_r_raw)
        feat = mdl.refine_column_sub(x_sub, pl_keys, pl_r_raw, pl_mask,
                                     a2a_r_raw, a2a_mask)
        return mdl.refine_heads(feat), (r_pl, r_aa)

    variables = dec.init(jax.random.PRNGKey(0), method=fwd)
    ref_heads, (r_pl, r_aa) = dec.apply(variables, method=fwd)

    packed = RK.pack_refine_params(variables["params"], cfg.num_seed_layers,
                                   angle_size, None)
    S = RK.selector(D, cfg.num_heads, cfg.head_dim)
    x_pad = jnp.zeros((R, D), jnp.float32).at[:1 + Ka].set(x_sub)
    raa_pad = jnp.zeros((R, D), jnp.float32).at[1:1 + Ka].set(r_aa)
    mpl_f = jnp.broadcast_to(pl_mask[:, None], (R, D)).astype(jnp.float32)
    ma_row = jnp.zeros((R,), bool).at[1:1 + Ka].set(a2a_mask)
    ma_f = jnp.broadcast_to(ma_row[:, None], (R, D)).astype(jnp.float32)
    out = RK.refine_kernel(packed, x_pad, pl_keys, r_pl, mpl_f, raa_pad,
                           ma_f, S, cfg.num_heads, cfg.head_dim,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out[0, :angle_size]),
                               np.asarray(ref_heads["head_logits"]),
                               atol=2e-5, rtol=2e-5)
    got_off = np.tanh(np.asarray(out[1, :2])) * 2.0
    np.testing.assert_allclose(got_off, np.asarray(ref_heads["offset_xy"]),
                               atol=2e-5, rtol=2e-5)

    # fully-masked agent keys: row 0 must still refine (zero aggregate)
    ma0 = jnp.zeros((R, D), jnp.float32)

    def fwd0(mdl):
        feat = mdl.refine_column_sub(x_sub, pl_keys, pl_r_raw, pl_mask,
                                     a2a_r_raw, jnp.zeros((Ka,), bool))
        return mdl.refine_heads(feat)

    ref0 = dec.apply(variables, method=fwd0)
    out0 = RK.refine_kernel(packed, x_pad, pl_keys, r_pl, mpl_f, raa_pad,
                            ma0, S, cfg.num_heads, cfg.head_dim,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out0[0, :angle_size]),
                               np.asarray(ref0["head_logits"]),
                               atol=2e-5, rtol=2e-5)
