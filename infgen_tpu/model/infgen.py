"""Top-level model: map encoder + agent decoder.

Equivalent of InfGenDecoder (infgen/modules/infgen_decoder.py:15-143): the map
is encoded once per scenario; the agent decoder consumes the map features for
training forward or closed-loop rollout.
"""

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from infgen_tpu.config import Config
from infgen_tpu.model.agent_decoder import AgentDecoder
from infgen_tpu.model.map_encoder import MapEncoder


class InfGenModel(nn.Module):
    cfg: Config
    grid_xy: jnp.ndarray
    grid_size: int
    angle_size: int

    def setup(self):
        self.map_encoder = MapEncoder(self.cfg)
        self.agent_decoder = AgentDecoder(self.cfg, self.grid_xy,
                                          self.grid_size, self.angle_size)

    def __call__(self, inputs, scenario_map, agent_vocab, map_vocab_traj, rng,
                 deterministic: bool = False) -> Dict:
        """Training forward (infgen_decoder.py:114-121)."""
        map_enc = self.map_encoder(scenario_map, map_vocab_traj,
                                   pt_valid_mask=inputs.pt_valid_mask,
                                   deterministic=deterministic)
        pred = self.agent_decoder(
            inputs, map_enc["x_pt"], agent_vocab,
            scenario_map.position, scenario_map.orientation, scenario_map.mask,
            rng, deterministic=deterministic)
        pred["map_next_token_logits"] = map_enc["map_next_token_logits"]
        return pred

    def encode_map(self, scenario_map, map_vocab_traj, deterministic: bool = True):
        """Map encoding for inference (map encoded once: infgen_decoder.py:123-130)."""
        return self.map_encoder(scenario_map, map_vocab_traj,
                                deterministic=deterministic)
