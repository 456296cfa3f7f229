"""Fixed-k neighbor selection: the TPU replacement for torch_cluster.radius.

The reference builds sparse edge lists with CUDA radius kernels
(agent_decoder.py:632,710; map_decoder.py:91). On TPU we instead compute
masked pairwise distances and take the k nearest within the radius — static
shapes, MXU/VPU friendly, and (unlike torch_cluster, which truncates
arbitrarily at max_num_neighbors) deterministically keeps the *closest* k.
"""

import jax
import jax.numpy as jnp


def topk_neighbors(query_pos, key_pos, k: int, radius: float,
                   query_mask=None, key_mask=None, exclude_self: bool = False):
    """k nearest keys within `radius` of each query.

    query_pos: [..., Q, 2]; key_pos: [..., K, 2].
    Returns (indices [..., Q, k] int32, valid [..., Q, k] bool).
    Invalid slots point at key 0 with valid=False.
    """
    d2 = ((query_pos[..., :, None, :] - key_pos[..., None, :, :]) ** 2).sum(-1)
    k = min(k, d2.shape[-1])
    big = jnp.inf
    if key_mask is not None:
        d2 = jnp.where(key_mask[..., None, :], d2, big)
    if exclude_self:
        Q, K = d2.shape[-2], d2.shape[-1]
        eye = jnp.eye(Q, K, dtype=bool)
        d2 = jnp.where(eye, big, d2)
    neg, idx = jax.lax.top_k(-d2, k)  # nearest-k
    dist2 = -neg
    valid = dist2 <= radius * radius
    if query_mask is not None:
        valid = valid & query_mask[..., None]
    return idx.astype(jnp.int32), valid


def pairwise_radius_mask(query_pos, key_pos, radius: float,
                         query_mask=None, key_mask=None, exclude_self: bool = False):
    """Dense [..., Q, K] bool mask: key within `radius` of query.

    Replaces radius_graph for small node sets (agents <=128) where the
    reference's neighbor cap never binds.
    """
    d2 = ((query_pos[..., :, None, :] - key_pos[..., None, :, :]) ** 2).sum(-1)
    mask = d2 <= radius * radius
    if exclude_self:
        Q, K = mask.shape[-2], mask.shape[-1]
        mask = mask & ~jnp.eye(Q, K, dtype=bool)
    if key_mask is not None:
        mask = mask & key_mask[..., None, :]
    if query_mask is not None:
        mask = mask & query_mask[..., :, None]
    return mask
