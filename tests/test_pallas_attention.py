"""Pallas r-biased attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

from infgen_tpu.ops.pallas_attention import (
    r_biased_attention,
    r_biased_attention_reference,
)


@pytest.mark.parametrize("B,N", [(2, 21), (1, 48), (3, 130)])
def test_kernel_matches_reference(B, N):
    H, d, Dr = 4, 16, 32
    rng = np.random.default_rng(N)
    q, k, v = (rng.normal(size=(B, N, H * d)).astype(np.float32) for _ in range(3))
    r = rng.normal(size=(B, N, N, Dr)).astype(np.float32)
    wk, wv = ((rng.normal(size=(Dr, H * d)) * 0.1).astype(np.float32)
              for _ in range(2))
    mask = rng.uniform(size=(B, N, N)) < 0.5
    mask[0, min(3, N - 1)] = False  # a fully-masked query row

    ref = np.asarray(r_biased_attention_reference(q, k, v, r, wk, wv, mask, H))
    out = np.asarray(r_biased_attention(q, k, v, r, wk, wv, mask, H,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5)
    # fully-masked query -> exact zeros
    assert np.abs(out[0, min(3, N - 1)]).max() == 0.0


def test_kernel_dropout_matches_reference():
    """Post-softmax dropout multiplier semantics (torch attn_drop)."""
    B, N, H, d, Dr = 2, 40, 4, 16, 32
    rng = np.random.default_rng(3)
    q, k, v = (rng.normal(size=(B, N, H * d)).astype(np.float32) for _ in range(3))
    r = rng.normal(size=(B, N, N, Dr)).astype(np.float32)
    wk, wv = ((rng.normal(size=(Dr, H * d)) * 0.1).astype(np.float32)
              for _ in range(2))
    mask = rng.uniform(size=(B, N, N)) < 0.5
    drop = (rng.uniform(size=(B, N, N, H)) < 0.9).astype(np.float32) / 0.9

    ref = np.asarray(r_biased_attention_reference(q, k, v, r, wk, wv, mask, H,
                                                  drop))
    out = np.asarray(r_biased_attention(q, k, v, r, wk, wv, mask, H, drop,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_trainable_kernel_gradients_match_xla():
    """custom-VJP (fused forward + recompute backward) gradients == XLA path
    gradients (VERDICT round-1 item #2 gradient check)."""
    import jax
    import jax.numpy as jnp

    from infgen_tpu.ops.pallas_attention import r_biased_attention_trainable

    B, N, H, d, Dr = 2, 24, 2, 16, 8
    rng = np.random.default_rng(5)
    q, k, v = (rng.normal(size=(B, N, H * d)).astype(np.float32) for _ in range(3))
    r = rng.normal(size=(B, N, N, Dr)).astype(np.float32)
    wk, wv = ((rng.normal(size=(Dr, H * d)) * 0.1).astype(np.float32)
              for _ in range(2))
    mask = rng.uniform(size=(B, N, N)) < 0.6
    mask[0, 1] = False
    drop = (rng.uniform(size=(B, N, N, H)) < 0.9).astype(np.float32) / 0.9

    def loss_kernel(q, k, v, r, wk, wv):
        o = r_biased_attention_trainable(q, k, v, r, wk, wv, mask, H, drop,
                                         True)
        return (o ** 2).sum()

    def loss_xla(q, k, v, r, wk, wv):
        o = r_biased_attention_reference(q, k, v, r, wk, wv, mask, H, drop)
        return (o ** 2).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, r, wk, wv)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, r, wk, wv)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3)


def test_dense_attention_pallas_path_matches_xla():
    """DenseAttention(use_pallas=True) == use_pallas=False through the full
    module (gated update + FFN), values and gradients, for both the batched
    [T, N, D] and the unbatched rollout-column [A, D] call shapes."""
    import jax
    import jax.numpy as jnp

    from infgen_tpu.model.layers import DenseAttention

    A, D, H, Hd = 24, 32, 2, 16
    rng = np.random.default_rng(9)
    mod_x = DenseAttention(D, H, Hd, use_pallas=False)
    mod_p = DenseAttention(D, H, Hd, use_pallas=True)

    for shape in [(A, D), (3, A, D)]:
        x = rng.normal(size=shape).astype(np.float32)
        rr = rng.normal(size=(*shape[:-1], shape[-2], D)).astype(np.float32)
        mask = rng.uniform(size=(*shape[:-1], shape[-2])) < 0.5
        params = mod_x.init(jax.random.PRNGKey(0), x, None, rr, mask, True)
        out_x = mod_x.apply(params, x, None, rr, mask, True)
        out_p = mod_p.apply(params, x, None, rr, mask, True)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=2e-4, rtol=1e-4)

        gx = jax.grad(lambda p: (mod_x.apply(p, x, None, rr, mask, True) ** 2
                                 ).sum())(params)
        gp = jax.grad(lambda p: (mod_p.apply(p, x, None, rr, mask, True) ** 2
                                 ).sum())(params)
        for a, b in zip(jax.tree_util.tree_leaves(gx),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-3, rtol=1e-3)


def test_kernel_rectangular_bipartite():
    """Q != K (training seed stack: S seed queries vs A agent keys)."""
    B, Q, K, H, d, Dr = 3, 10, 130, 4, 16, 32
    rng = np.random.default_rng(13)
    q = rng.normal(size=(B, Q, H * d)).astype(np.float32)
    k = rng.normal(size=(B, K, H * d)).astype(np.float32)
    v = rng.normal(size=(B, K, H * d)).astype(np.float32)
    r = rng.normal(size=(B, Q, K, Dr)).astype(np.float32)
    wk, wv = ((rng.normal(size=(Dr, H * d)) * 0.1).astype(np.float32)
              for _ in range(2))
    mask = rng.uniform(size=(B, Q, K)) < 0.5
    mask[0, 2] = False

    ref = np.asarray(r_biased_attention_reference(q, k, v, r, wk, wv, mask, H))
    out = np.asarray(r_biased_attention(q, k, v, r, wk, wv, mask, H,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5)
