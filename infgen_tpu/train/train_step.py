"""Training step: optax AdamW + warmup-cosine, data-parallel over a mesh.

Replaces the reference's Lightning/DDP stack (run.py:106-146,
model/infgen.py:863-874): grads are averaged across the `data` mesh axis by
XLA collectives inserted from sharding annotations — the NCCL all-reduce
equivalent over ICI.
"""

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infgen_tpu.config import Config
from infgen_tpu.data.features import build_model_inputs
from infgen_tpu.model.infgen import InfGenModel
from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer
from infgen_tpu.tokenizers.vocab import load_map_vocab
from infgen_tpu.train.losses import compute_losses


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(cfg: Config):
    """Linear warmup then cosine to zero over total_steps (model/infgen.py:866-871)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step + 1) / max(1, cfg.warmup_steps)
        denom = max(1, cfg.total_steps - cfg.warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * (step - cfg.warmup_steps) / denom)))
        return cfg.lr * jnp.where(step + 1 < cfg.warmup_steps, warm, cos)
    return fn


class Trainer:
    """Owns model, tokenizers, optimizer, and the jitted sharded train step."""

    def __init__(self, cfg: Config, mesh: Mesh = None):
        self.cfg = cfg
        self.attr = AttrTokenizer(cfg.grid_range, cfg.grid_interval,
                                  cfg.pl2seed_radius, cfg.angle_interval)
        self.motion_tok = MotionTokenizer()
        self.map_vocab = load_map_vocab()
        self.is_occ_decoder = cfg.decoder_type == "occ_decoder"
        if self.is_occ_decoder:
            from infgen_tpu.model.occ_decoder import OccDecoder
            self.model = OccDecoder(cfg, self.attr.grid_size)
        else:
            self.model = InfGenModel(cfg, self.attr.grid, self.attr.grid_size,
                                     self.attr.angle_size)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adamw(learning_rate=lr_schedule(cfg)),
        )
        if cfg.accumulate_grad_batches > 1:
            # gradient accumulation (reference run.py:132 accumulate_grad_
            # batches -> Lightning): params update every k micro-batches
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=cfg.accumulate_grad_batches)
        if mesh is None:
            import numpy as np
            devs = jax.devices()
            tp = cfg.mesh_shape.get("model", 1)
            if tp > 1:
                from infgen_tpu.parallel.tp import make_mesh
                mesh = make_mesh(devs, data=cfg.mesh_shape.get("data", 0),
                                 model=tp)
            else:
                n = cfg.mesh_shape.get("data", 0) or len(devs)
                mesh = Mesh(np.array(devs[:n]), axis_names=("data",))
        self.mesh = mesh
        self._jit_step = None

    # ---------------- init ----------------

    def init_state(self, rng, scenario) -> TrainState:
        inputs = build_model_inputs(self.cfg, self.motion_tok, self.attr,
                                    scenario, rng)
        # jit the init: flax init otherwise runs eagerly op-by-op, which is
        # pathologically slow on remote TPU backends
        if self.is_occ_decoder:
            variables = jax.jit(self.model.init)(
                {"params": rng}, inputs, scenario.map.position,
                scenario.map.orientation, rng)
        else:
            variables = jax.jit(self.model.init, static_argnames=("deterministic",))(
                {"params": rng, "dropout": rng}, inputs, scenario.map,
                self.motion_tok.vocab, self.map_vocab["traj_src"], rng,
                deterministic=True)
        params = variables["params"]
        if self.cfg.param_dtype != "float32":
            from infgen_tpu.ops.precision import cast_params_for_compute
            params = cast_params_for_compute(params, self.cfg.param_dtype)
        opt_state = self.tx.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    # ---------------- loss ----------------

    def loss_fn(self, params, scenario, rng, deterministic=False):
        rng_in, rng_fwd, rng_drop = jax.random.split(rng, 3)
        inputs = build_model_inputs(self.cfg, self.motion_tok, self.attr,
                                    scenario, rng_in)
        if self.is_occ_decoder:
            from infgen_tpu.model.occ_decoder import occ_decoder_loss
            pred = self.model.apply({"params": params}, inputs,
                                    scenario.map.position,
                                    scenario.map.orientation, rng_fwd)
            return occ_decoder_loss(pred)
        pred = self.model.apply(
            {"params": params}, inputs, scenario.map, self.motion_tok.vocab,
            self.map_vocab["traj_src"], rng_fwd, deterministic=deterministic,
            rngs={"dropout": rng_drop})
        return compute_losses(self.cfg, self.attr.grid_size, pred, inputs)

    def batch_loss(self, params, batch, rng, deterministic=False):
        B = jax.tree_util.tree_leaves(batch)[0].shape[0]
        rngs = jax.random.split(rng, B)
        losses, logs = jax.vmap(
            lambda s, r: self.loss_fn(params, s, r, deterministic)
        )(batch, rngs)
        return losses.mean(), jax.tree.map(jnp.mean, logs)

    # ---------------- step ----------------

    def make_train_step(self, state_shardings=None):
        # NOTE: the input TrainState is DONATED — its buffers are invalidated
        # by the call. Snapshot with jax.device_get(state) before stepping if
        # you need the old parameters (e.g. trained-vs-untrained comparisons).
        # Pinning out_shardings to the input placement keeps the state layout
        # stable across steps (otherwise GSPMD may pick different shardings
        # for the updated params, forcing a reshard + recompile at step 2).
        kw = {} if state_shardings is None else {
            "out_shardings": (state_shardings, None)}
        @partial(jax.jit, donate_argnums=(0,), **kw)
        def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
            (loss, logs), grads = jax.value_and_grad(
                self.batch_loss, has_aux=True)(state.params, batch, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            logs["grad_norm"] = optax.global_norm(grads)
            return TrainState(params, opt_state, state.step + 1), logs

        return step

    def train_step(self, state, batch, rng):
        if self._jit_step is None:
            try:
                shardings = jax.tree.map(lambda x: x.sharding, state)
            except AttributeError:   # host-side numpy leaves: let XLA place
                shardings = None
            self._jit_step = self.make_train_step(shardings)
        return self._jit_step(state, batch, rng)

    # ---------------- sharding helpers ----------------

    def shard_batch(self, batch):
        """Place a stacked-scenario batch across the data mesh axis."""
        sharding = NamedSharding(self.mesh, P("data"))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def replicate_state(self, state):
        """Place the TrainState on the mesh: replicated on a pure-data mesh,
        Megatron-sharded over the `model` axis when the mesh has one."""
        if int(self.mesh.shape.get("model", 1)) > 1:
            from infgen_tpu.parallel.tp import state_sharding_tree
            shardings = state_sharding_tree(state, self.mesh)
            return jax.tree.map(jax.device_put, state, shardings)
        sharding = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sharding), state)

    def param_shardings(self, params):
        """NamedSharding pytree for bare params under the current mesh."""
        tp = int(self.mesh.shape.get("model", 1))
        if tp > 1:
            from infgen_tpu.parallel.tp import tree_param_specs
            return jax.tree.map(
                lambda s: NamedSharding(self.mesh, s),
                tree_param_specs(params, tp),
                is_leaf=lambda x: isinstance(x, P))
        return jax.tree.map(lambda _: NamedSharding(self.mesh, P()), params)


def stack_scenarios(scenarios):
    """Stack a list of Scenario pytrees into a leading batch axis.

    Stacks host-side in numpy: eager jnp.stack would dispatch one transfer +
    kernel per leaf on remote TPU backends.
    """
    import numpy as np
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *scenarios)
