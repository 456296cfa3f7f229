"""Two-process data-parallel test — the DCN (multi-host) analog.

The reference's multi-host story is Lightning DDP over NCCL (run.py:106);
ours is a jax.distributed mesh whose collectives ride DCN across hosts. Real
multi-host hardware doesn't exist in CI, so this spawns two OS processes,
forms a 2-process jax.distributed CPU cluster, and runs one data-parallel
train step with per-process batch shards — exercising cross-process
all-reduce semantics end-to-end (grads averaged over the global mesh).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["REPO"])
from infgen_tpu.config import Config
from infgen_tpu.data.synthetic import make_synthetic_scenario
from infgen_tpu.train.train_step import Trainer, stack_scenarios

cfg = Config(max_agents=16, max_map_tokens=128, num_agent_layers=1,
             num_seed_layers=1, num_map_layers=1, hidden_dim=32,
             num_heads=2, head_dim=16, num_freq_bands=8, num_seed_feature=4)
devs = np.array(jax.devices())          # 2 global devices, 1 per process
assert devs.size == 2, devs
mesh = Mesh(devs, ("data",))
trainer = Trainer(cfg, mesh=mesh)

pid = jax.process_index()
# per-process local scenario (different data per rank)
scen = make_synthetic_scenario(cfg, seed=pid, num_agents=8)
local = stack_scenarios([scen])

state = trainer.init_state(jax.random.PRNGKey(0), scen)
# host numpy first: device_put of single-device arrays onto a global
# (cross-process) sharding is rejected; identical-per-process numpy is fine
state = trainer.replicate_state(jax.device_get(state))

# build the global batch from process-local shards (DistributedSampler analog)
sharding = NamedSharding(mesh, P("data"))
batch = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(
        sharding, np.asarray(x), (2 * x.shape[0], *x.shape[1:])),
    local)

state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(1))
loss = float(logs["loss"])
assert np.isfinite(loss), logs
# grads were all-reduced: params identical across processes
leaf = np.asarray(jax.device_get(
    jax.tree_util.tree_leaves(state.params)[0]))
print(f"RANK{pid} loss={loss:.6f} leaf={float(leaf.ravel()[0]):.8f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    coord = f"localhost:{port.getsockname()[1]}"
    port.close()

    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("XLA_FLAGS", "JAX_"))}
    procs = []
    logs = []
    for pid in range(2):
        env = dict(env_base, COORD=coord, PROC_ID=str(pid),
                   REPO=os.path.join(os.path.dirname(__file__), ".."),
                   JAX_PLATFORMS="cpu")
        f = open(tmp_path / f"rank{pid}.log", "w")
        logs.append(f)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, stdout=f,
            stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=900) for p in procs]
    for f in logs:
        f.close()
    outs = [(tmp_path / f"rank{i}.log").read_text() for i in range(2)]
    assert rcs == [0, 0], f"worker failures:\n{outs[0]}\n{outs[1]}"

    vals = {}
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith(f"RANK{i}")][0]
        vals[i] = line.split("leaf=")[1]
    # same post-step params on both ranks -> the grad all-reduce happened
    assert vals[0] == vals[1], (outs[0], outs[1])
