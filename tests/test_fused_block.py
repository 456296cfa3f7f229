"""Fused DenseAttention-block kernel vs the flax module (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infgen_tpu.model.layers import DenseAttention
from infgen_tpu.ops.fused_block import fused_attention_block

D, H, Hd = 128, 8, 16


def _mk(bipartite):
    return DenseAttention(D, H, Hd, dropout=0.0, bipartite=bipartite)


@pytest.mark.parametrize("case", ["square", "shared_keys", "per_query",
                                  "bipartite_gathered", "q1"])
def test_fused_block_matches_module(case):
    rng = np.random.default_rng(hash(case) % 2 ** 31)
    Q = 1 if case == "q1" else 37
    K = {"square": 37, "shared_keys": 53, "per_query": 12,
         "bipartite_gathered": 5, "q1": 24}[case]
    bipartite = case == "bipartite_gathered"

    x = rng.normal(size=(Q, D)).astype(np.float32)
    r = rng.normal(size=(Q, K, D)).astype(np.float32)
    mask = rng.uniform(size=(Q, K)) < 0.5
    if Q > 3:
        mask[3] = False  # fully-masked query row

    if case == "square":
        x_src = None
        x_src_mod = None
    elif case in ("per_query", "bipartite_gathered"):
        x_src = rng.normal(size=(Q, K, D)).astype(np.float32)
        x_src_mod = x_src
    else:
        x_src = rng.normal(size=(K, D)).astype(np.float32)
        x_src_mod = x_src

    mod = _mk(bipartite)
    if x_src_mod is not None and x_src_mod.ndim == 3:
        # module consumes gathered keys as [Q, 1, K, D] query rows
        params = mod.init(jax.random.PRNGKey(0), x[:, None, :], x_src_mod,
                          r[:, None], mask[:, None], True)
        ref = mod.apply(params, x[:, None, :], x_src_mod, r[:, None],
                        mask[:, None], True)[:, 0]
    else:
        params = mod.init(jax.random.PRNGKey(0), x, x_src_mod, r, mask, True)
        ref = mod.apply(params, x, x_src_mod, r, mask, True)

    out = fused_attention_block(params["params"], x, x_src, r, mask, H,
                                bipartite=bipartite, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=2e-4)


def test_rollout_runs_with_fused_blocks():
    """Closed-loop rollout with use_fused_block=True produces finite outputs
    (kernel math parity is covered case-by-case above; sampling makes full
    trajectory comparison against the XLA path chaotic by construction)."""
    from infgen_tpu.config import Config
    from infgen_tpu.data.features import build_model_inputs
    from infgen_tpu.data.synthetic import make_synthetic_scenario
    from infgen_tpu.model.infgen import InfGenModel
    from infgen_tpu.rollout.closed_loop import make_rollout_fn
    from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
    from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
    from infgen_tpu.tokenizers.vocab import load_map_vocab

    cfg = Config(max_agents=16, max_map_tokens=128, num_agent_layers=1,
                 num_seed_layers=1, num_map_layers=1, hidden_dim=32,
                 num_heads=2, head_dim=16, num_freq_bands=8,
                 num_seed_feature=4, num_recurrent_steps_val=15,
                 use_fused_block=True)
    attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval, cfg.pl2seed_radius,
                         cfg.angle_interval)
    mt = MotionTokenizer()
    mv = load_map_vocab()
    scen = make_synthetic_scenario(cfg, seed=0, num_agents=10)
    inputs = jax.jit(lambda s, r: build_model_inputs(cfg, mt, attr, s, r))(
        scen, jax.random.PRNGKey(0))
    model = InfGenModel(cfg, attr.grid, attr.grid_size, attr.angle_size)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, scen.map, mt.vocab, mv["traj_src"], jax.random.PRNGKey(2),
        deterministic=True)
    rollout = make_rollout_fn(model, cfg, attr, mt, mv)
    out = rollout(variables["params"], scen, inputs, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out["pred_traj"])).all()
    assert np.isfinite(np.asarray(out["pred_head"])).all()
