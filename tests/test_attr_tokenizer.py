"""Parity tests: AttrTokenizer vs the reference Attr_Tokenizer."""

import numpy as np
import pytest
import torch

from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer
from tests.ref_oracle import import_reference

ref_attr, _ = import_reference()


@pytest.fixture(scope="module")
def tokenizers():
    ours = AttrTokenizer(grid_range=150.0, grid_interval=3.0, radius=75.0, angle_interval=3.0)
    ref = ref_attr.Attr_Tokenizer(grid_range=150.0, grid_interval=3.0, radius=75.0, angle_interval=3.0)
    return ours, ref


def test_grid_matches(tokenizers):
    ours, ref = tokenizers
    assert ours.grid_size == ref.grid_size == 1961
    assert ours.angle_size == ref.angle_size == 120
    np.testing.assert_allclose(np.asarray(ours.grid), ref.grid.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.dist), ref.dist.numpy(), atol=1e-5)
    # compare angles modulo 2*pi (atan2 sign-of-zero differs at the +-pi boundary)
    dd = np.abs(np.asarray(ours.dir) - ref.dir.numpy())
    dd = np.minimum(dd, 2 * np.pi - dd)
    assert dd.max() < 1e-5


def test_encode_decode_pos(tokenizers):
    ours, ref = tokenizers
    rng = np.random.default_rng(0)
    x = rng.uniform(-60, 60, size=(17, 2)).astype(np.float32)
    y = rng.uniform(-5, 5, size=(1, 2)).astype(np.float32)
    theta = np.float32(rng.uniform(-np.pi, np.pi))

    idx_ref, off_ref = ref.encode_pos(torch.tensor(x), torch.tensor(y), torch.tensor(theta))
    idx_ours, off_ours = ours.encode_pos(x, y, theta)
    np.testing.assert_array_equal(np.asarray(idx_ours), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(off_ours), off_ref.numpy(), atol=1e-4)

    dec_ref = ref.decode_pos(idx_ref, torch.tensor(y), torch.tensor(theta))
    dec_ours = ours.decode_pos(np.asarray(idx_ours), y, theta)
    np.testing.assert_allclose(np.asarray(dec_ours), dec_ref.numpy(), atol=1e-4)


def test_encode_decode_heading(tokenizers):
    ours, ref = tokenizers
    rng = np.random.default_rng(1)
    h = rng.uniform(-4 * np.pi, 4 * np.pi, size=(64,)).astype(np.float32)
    idx_ref = ref.encode_heading(torch.tensor(h))
    idx_ours = ours.encode_heading(h)
    np.testing.assert_array_equal(np.asarray(idx_ours), idx_ref.numpy())

    dec_ref = ref.decode_heading(idx_ref)
    dec_ours = ours.decode_heading(np.asarray(idx_ours))
    np.testing.assert_allclose(np.asarray(dec_ours), dec_ref.numpy(), atol=1e-5)


def test_pad_square_roundtrip(tokenizers):
    ours, _ = tokenizers
    rng = np.random.default_rng(2)
    prob = rng.uniform(size=(3, ours.grid_size))
    padded, idx = ours.pad_square(prob, indices=np.array([0, 5, ours.grid_size - 1]))
    assert padded.shape == (3, ours.num_grid ** 2)
    assert np.isclose(padded.sum(), prob.sum())
    assert (idx >= 0).all()
