"""InfGen-TPU: a TPU-native (JAX/XLA/Pallas) long-term traffic simulation framework.

Re-implements the capabilities of InfGen ("Long-term Traffic Simulation with
Interleaved Autoregressive Motion and Scenario Generation", ICCV 2025) with a
TPU-first architecture: fixed shapes, dense masked attention, `lax.scan`
closed-loop rollouts, and `jax.sharding` data parallelism.

Reference repo layer map: see SURVEY.md §1 (reference: /root/reference).
"""

__version__ = "0.1.0"

from infgen_tpu.config import Config, load_config  # noqa: F401
