"""Mixed-precision compute policy.

The reference ships AMP scaffolding it never uses (maybe_autocast,
infgen/model/infgen.py:221-227; `precision: 32` configs). The TPU build makes
the policy real via flax's dtype mechanism: master params and optimizer state
stay float32, and every Dense/Embed/LayerNorm in the trunk receives
`dtype=bfloat16` (model/layers.py), so matmuls run bf16 on the MXU while
gradients flow back to the fp32 masters. Numerically sensitive math stays
fp32 explicitly: attention scores accumulate fp32 (preferred_element_type),
softmax/sampling/losses cast up (train/losses.py, rollout/closed_loop.py),
prediction heads keep dtype=None (fp32 logits), and flax LayerNorm computes
its statistics in fp32 internally.
"""

import jax
import jax.numpy as jnp

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": None,
    "f32": None,
    None: None,
}


def compute_dtype_of(name):
    """Resolve a config string to a flax module `dtype` (None = float32)."""
    return _DTYPES[name]


def cast_params_for_compute(params, dtype_name):
    """Cast float param leaves to a storage dtype; non-float leaves pass.

    Used for `param_dtype` (checkpoint / inference-only storage), not for the
    compute policy — compute casting happens inside flax modules via `dtype`.
    """
    dt = compute_dtype_of(dtype_name) if isinstance(dtype_name, str) \
        else dtype_name
    if dt is None:
        return params
    return jax.tree.map(
        lambda p: p.astype(dt) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params)
