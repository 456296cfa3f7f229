"""AOT rollout export (infgen_tpu/rollout/export.py): serialize -> reload ->
bitwise-identical trajectories, without re-tracing the model code."""

import jax
import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.rollout.export import (
    export_rollout, load_rollout_artifact, save_rollout_artifact)
from infgen_tpu.train.train_step import Trainer

TINY = dict(max_agents=16, max_map_tokens=128, num_agent_layers=2,
            num_seed_layers=1, num_map_layers=1, hidden_dim=32,
            num_heads=2, head_dim=16, num_freq_bands=8,
            num_seed_feature=4, num_recurrent_steps_val=20)


def test_export_roundtrip(tmp_path):
    from infgen_tpu.rollout.closed_loop import make_rollout_fn

    cfg = Config(**TINY)
    tr = Trainer(cfg)
    scen = make_synthetic_scenario(cfg, seed=0, num_agents=6)
    state = tr.init_state(jax.random.PRNGKey(0), scen)
    rng = jax.random.PRNGKey(3)
    inputs = jax.jit(lambda s, r: build_model_inputs(
        cfg, tr.motion_tok, tr.attr, s, r))(scen, rng)

    blob = export_rollout(cfg, tr.attr, tr.motion_tok, tr.map_vocab,
                          scen, inputs, rng, state.params)
    assert len(blob) > 1000
    path = tmp_path / "rollout_a16.stablehlo"
    save_rollout_artifact(str(path), blob)

    served = load_rollout_artifact(str(path))
    out = served(state.params, scen, inputs, rng)

    direct = make_rollout_fn(tr.model, cfg, tr.attr, tr.motion_tok,
                             tr.map_vocab)
    out_ref = direct(state.params, scen, inputs, rng)
    np.testing.assert_array_equal(np.asarray(out["next_token_idx"]),
                                  np.asarray(out_ref["next_token_idx"]))
    np.testing.assert_allclose(np.asarray(out["pred_traj"]),
                               np.asarray(out_ref["pred_traj"]), atol=0)
