"""Host batch-generator shim + partner (PSD) JSON round-trip."""

import json

import numpy as np
import pytest

from flypylib_tpu.io.synapses import Tbars, load_from_json, save_to_json
from flypylib_tpu.train.batches import gen_batches


def test_gen_batches_shapes_and_types(rng):
    image = rng.random((32, 32, 32)).astype(np.float32)
    labels = (image > 0.95).astype(np.float32)
    mask = np.ones_like(labels)
    g = gen_batches(image, labels, mask, patch_size=13, batch_size=4,
                    context=2, seed=0)
    x, y, m = next(g)
    assert x.shape == (4, 13, 13, 13) and x.dtype == np.float32
    assert y.shape == (4, 9, 9, 9) and m.shape == (4, 9, 9, 9)
    x2, _, _ = next(g)
    assert not np.array_equal(x, x2)  # random sampling advances


def test_gen_batches_pos_sampling(rng):
    """With pos_fraction=1 every patch contains positive labels."""
    image = np.zeros((32, 32, 32), np.float32)
    labels = np.zeros_like(image)
    labels[10, 12, 14] = 1
    labels[20, 8, 25] = 1
    mask = np.ones_like(image)
    g = gen_batches(image, labels, mask, patch_size=11, batch_size=8,
                    context=0, pos_fraction=1.0, pos_jitter=2, seed=1)
    for _ in range(3):
        _, y, _ = next(g)
        assert (y.reshape(8, -1).sum(axis=1) > 0).all()


def test_gen_batches_uint8_scaling(rng):
    image = rng.integers(0, 256, (20, 20, 20)).astype(np.uint8)
    labels = np.zeros((20, 20, 20), np.float32)
    mask = np.ones_like(labels)
    x, _, _ = next(gen_batches(image, labels, mask, 9, 2, augment=False))
    assert x.max() <= 1.0


def test_partner_roundtrip(tmp_path):
    tb = Tbars(
        locs=[[5, 6, 7], [10, 11, 12]],
        conf=[0.9, 0.8],
        partners=[np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
                  np.zeros((0, 3))],
    )
    p = str(tmp_path / "tb.json")
    save_to_json(tb, p, style="raveler")
    back = load_from_json(p)
    assert back.partners is not None
    np.testing.assert_array_equal(back.partners[0], tb.partners[0])
    assert len(back.partners[1]) == 0
    # raw JSON uses [x, y, z] for partner locations
    obj = json.load(open(p))
    assert obj["data"][0]["partners"][0]["location"] == [3, 2, 1]
