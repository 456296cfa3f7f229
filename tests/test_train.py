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
