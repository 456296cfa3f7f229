"""Multi-chip parallelism: mesh construction and sharding rules.

The reference scales with Lightning DDP over NCCL (run.py:106-146); here the
equivalent is GSPMD over a `jax.sharding.Mesh` — sharding annotations on the
parameter/batch pytrees, with XLA inserting the ICI collectives. `tp.py` adds
Megatron-style tensor parallelism on top of the data axis.
"""

from infgen_tpu.parallel.tp import (  # noqa: F401
    make_mesh,
    param_spec_for_path,
    state_sharding_tree,
    tree_param_specs,
)
