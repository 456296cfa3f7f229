"""Checkpoint round-trip + non-strict warm start + train-metric sanity."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from infgen_tpu.metrics.train_metrics import (
    grid_overlap_rate,
    min_ade,
    min_fde,
    state_accuracy,
    token_cls_accuracy,
)
from infgen_tpu.train.checkpoint import CheckpointManager, load_weights


def test_checkpoint_roundtrip():
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)},
        "step": jnp.asarray(7),
    }
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, save_interval_steps=1)
        assert mgr.save(7, jax.device_get(state))
        mgr.wait()
        assert mgr.latest_step() == 7
        template = jax.tree.map(jnp.zeros_like, state)
        restored = mgr.restore(jax.device_get(template))
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                                   np.arange(6).reshape(2, 3))
        assert int(restored["step"]) == 7


def test_load_weights_nonstrict():
    template = {"a": jnp.zeros((2, 2)), "b": jnp.zeros(3), "c": jnp.zeros(4)}
    ckpt = {"a": jnp.ones((2, 2)), "b": jnp.ones(5)}  # b mismatched, c missing
    out = load_weights(template, ckpt)
    assert np.asarray(out["a"]).sum() == 4  # loaded
    assert np.asarray(out["b"]).sum() == 0  # shape mismatch -> template
    assert np.asarray(out["c"]).sum() == 0  # missing -> template


def test_train_metrics_basics():
    pred = np.zeros((2, 80, 2))
    target = np.ones((2, 80, 2))
    vm = np.ones((2, 80), bool)
    s, n = min_ade(pred, target, vm)
    assert abs(float(s) / float(n) - np.sqrt(2) * 70 / 80) < 1e-5
    s, n = min_fde(pred, target, vm)
    assert abs(float(s) / float(n) - np.sqrt(2)) < 1e-5

    topk = np.array([[1, 2], [3, 4]])[:, None, :].repeat(3, 1)
    tgt = np.array([[1, 1, 2], [4, 0, 0]])
    s, n = token_cls_accuracy(topk, tgt, np.ones((2, 3), bool), max_guesses=1)
    assert int(s) == 2 and int(n) == 6

    # GT-consistent state sequence scores 100%
    state = np.array([[0, 2, 1, 1, 3, 0]], np.int32)
    sa = state_accuracy(state)
    assert int(sa["valid_sum"]) == int(sa["valid_count"]) == 2
    assert int(sa["invalid_sum"]) == int(sa["invalid_count"]) == 2

    go = grid_overlap_rate(np.array([[2, 1], [2, 1], [1, 1]], np.int32),
                           np.array([[5, 5], [5, 6], [5, 7]], np.int32),
                           grid_size=10, seed_size=2)
    # step 0: two entering agents on cell 5, one occupied by a valid agent
    assert int(np.asarray(go["num_overlap_t"])[0]) == 2
    assert int(np.asarray(go["num_insert_agent_t"])[0]) == 2


def test_resume_tree_mismatch_warm_start(tmp_path):
    """train(resume=True) over a checkpoint whose param tree no longer
    matches the model (e.g. a head added since it was written, like
    use_grid_index_head) must fall back to a non-strict weights-only warm
    start instead of crashing on orbax's strict StandardRestore."""
    from infgen_tpu.config import Config
    from infgen_tpu.train.loop import SyntheticDataset, train

    cfg = Config(max_agents=16, max_map_tokens=32, hidden_dim=16, num_heads=2,
                 head_dim=8, num_freq_bands=4, num_agent_layers=1,
                 num_seed_layers=1, num_map_layers=1, num_token_steps=6,
                 num_historical_steps=11, num_future_steps=20,
                 train_batch_size=1, predict_occ=False, dropout=0.0,
                 use_grid_index_head=False)
    ds = SyntheticDataset(cfg, size=2)
    logs = []
    train(cfg, ds, save_dir=str(tmp_path), max_steps=1,
          log_fn=logs.append, resume=True)
    # same run dir, but the model now has an extra head in its param tree
    cfg2 = cfg.replace(use_grid_index_head=True)
    state = train(cfg2, ds, save_dir=str(tmp_path), max_steps=1,
                  log_fn=logs.append, resume=True)
    assert state is not None
    assert any("warm-started weights only" in m for m in logs), logs
