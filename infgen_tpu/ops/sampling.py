"""On-device sampling matching the reference's beam-multinomial semantics."""

import jax
import jax.numpy as jnp


def sample_from_topk(rng, probs, k: int):
    """Top-k then multinomial over the k renormalized probabilities.

    probs: [..., V] (need not be normalized). Returns sampled indices [...].
    Reference: motion top-5 multinomial (agent_decoder.py:2163,2194) and
    insertion grid top-10 multinomial (agent_decoder.py:1902-1904).
    """
    topk_p, topk_idx = jax.lax.top_k(probs, k)
    # categorical over the unnormalized top-k (multinomial renormalizes)
    choice = jax.random.categorical(rng, jnp.log(jnp.maximum(topk_p, 1e-30)), axis=-1)
    return jnp.take_along_axis(topk_idx, choice[..., None], axis=-1)[..., 0]
