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
