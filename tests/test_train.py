"""End-to-end training-step tests: loss masks, grads, DP mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from infgen_tpu.train.targets import token_state_eval_masks
from infgen_tpu.train.train_step import Trainer, stack_scenarios


@pytest.fixture(scope="module")
def cfg():
    return Config(max_agents=16, max_map_tokens=128, num_agent_layers=1,
                  num_seed_layers=1, num_map_layers=1, hidden_dim=32,
                  num_heads=2, head_dim=16, num_freq_bands=8, num_seed_feature=4)


def test_eval_masks_reference_semantics():
    # hand-built case: agent enters at 2, exits at 6 (T=9)
    T = 9
    m = np.zeros((1, T), bool)
    m[0, 2:7] = True  # raw token valid
    state = np.zeros((1, T), np.int32)
    state[0, 2] = 2   # enter
    state[0, 3:6] = 1
    state[0, 6] = 3   # exit
    tok, st = token_state_eval_masks(jnp.asarray(m), jnp.asarray(state),
                                     jnp.asarray(5), jnp.ones(1, bool))
    tok, st = np.asarray(tok[0]), np.asarray(st[0])
    # reference semantics: base = m & roll(m,±1) -> [3,4,5] true
    # bos=2: tok[2]=1, tok[3]=m[4]=1 ; eos=6: tok[6]=0 ; tok[0]=m0&m1=0, tok[-1]=0
    assert tok.tolist() == [False, False, True, True, True, True, False, False, False]
    # state: [:2]=0, st[2]=1, st[3]=m[4]=1, st[7:]=1, st[6]=m[5]=1, st[0]=0, st[-1]=0
    assert st.tolist() == [False, False, True, True, True, True, True, True, False]


def test_train_step_improves_loss(cfg):
    trainer = Trainer(cfg, mesh=Mesh(np.array(jax.devices()[:1]), ("data",)))
    scen = make_synthetic_scenario(cfg, seed=3, num_agents=10)
    state = trainer.init_state(jax.random.PRNGKey(0), scen)
    batch = stack_scenarios([scen])

    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, logs = trainer.train_step(state, batch, sub)
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1]), f"non-finite loss at step {i}: {logs}"
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_train_step_dp_mesh_8_devices(cfg):
    assert len(jax.devices()) == 8
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    trainer = Trainer(cfg, mesh=mesh)
    scens = [make_synthetic_scenario(cfg, seed=s, num_agents=9) for s in range(8)]
    state = trainer.init_state(jax.random.PRNGKey(0), scens[0])
    state = trainer.replicate_state(state)
    batch = trainer.shard_batch(stack_scenarios(scens))
    state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["grad_norm"]))
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


_CONFIG_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "configs")
_CONFIG_FILES = sorted(
    __import__("glob").glob(_CONFIG_DIR + "/**/*.yaml", recursive=True))


@pytest.mark.parametrize(
    "path", _CONFIG_FILES,
    ids=lambda p: p.split("configs/")[-1].replace(".yaml", ""))
def test_every_config_inits_and_trains_one_step(path):
    """The full experiment matrix (flagship / standard / smart / occ-decoder /
    map pretrain / ablations) initializes and takes one finite train step.
    Mirrors the reference's configs/ + configs/experiments/ matrix."""
    from infgen_tpu.config import load_config

    cfg = load_config(path)
    # shrink to smoke size; the flags under test (predict_* / use_*_token /
    # decoder_type / loss weights) come from the YAML unchanged
    cfg = cfg.replace(max_agents=16, max_map_tokens=128, num_agent_layers=1,
                      num_seed_layers=1, num_map_layers=1, hidden_dim=32,
                      num_heads=2, head_dim=16, num_freq_bands=8,
                      num_seed_feature=4)
    trainer = Trainer(cfg, mesh=Mesh(np.array(jax.devices()[:1]), ("data",)))
    scen = make_synthetic_scenario(cfg, seed=0, num_agents=10)
    state = trainer.init_state(jax.random.PRNGKey(0), scen)
    state, logs = trainer.train_step(state, stack_scenarios([scen]),
                                     jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"])), (path, logs)


def test_gradient_accumulation(cfg):
    """accumulate_grad_batches=2: params update only every second micro-step
    (reference run.py:132 -> Lightning accumulate_grad_batches)."""
    acc_cfg = cfg.replace(accumulate_grad_batches=2)
    trainer = Trainer(acc_cfg, mesh=Mesh(np.array(jax.devices()[:1]), ("data",)))
    scen = make_synthetic_scenario(acc_cfg, seed=3, num_agents=10)
    state = trainer.init_state(jax.random.PRNGKey(0), scen)
    batch = stack_scenarios([scen])

    p0 = jax.device_get(state.params)
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    p1 = jax.device_get(state.params)
    leaves0 = jax.tree_util.tree_leaves(p0)
    leaves1 = jax.tree_util.tree_leaves(p1)
    assert all(np.allclose(a, b) for a, b in zip(leaves0, leaves1)), \
        "params changed on an accumulation micro-step"
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    p2 = jax.device_get(state.params)
    leaves2 = jax.tree_util.tree_leaves(p2)
    assert not all(np.allclose(a, b) for a, b in zip(leaves0, leaves2)), \
        "params did not update after k micro-steps"


def test_bf16_compute_policy(cfg):
    """compute_dtype=bfloat16: train steps run, loss is finite and tracks the
    fp32 loss; params stay fp32 masters (ops/precision.py policy)."""
    bf_cfg = cfg.replace(compute_dtype="bfloat16")
    scen = make_synthetic_scenario(bf_cfg, seed=3, num_agents=10)
    batch = stack_scenarios([scen])

    losses = {}
    for name, c in (("f32", cfg), ("bf16", bf_cfg)):
        trainer = Trainer(c, mesh=Mesh(np.array(jax.devices()[:1]), ("data",)))
        state = trainer.init_state(jax.random.PRNGKey(0), scen)
        # master params stay fp32 regardless of compute dtype
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(state.params)
                   if jnp.issubdtype(l.dtype, jnp.floating))
        ls = []
        rng = jax.random.PRNGKey(1)
        for _ in range(3):
            rng, sub = jax.random.split(rng)
            state, logs = trainer.train_step(state, batch, sub)
            ls.append(float(logs["loss"]))
            assert np.isfinite(ls[-1])
        losses[name] = ls
    # same init, same data: bf16 loss within a few percent of fp32
    for a, b in zip(losses["f32"], losses["bf16"]):
        assert abs(a - b) / max(abs(a), 1e-6) < 0.05, losses
