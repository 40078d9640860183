"""Pallas fused conv3d+bias+relu vs lax reference (interpret mode on CPU;
the same kernel compiles on TPU — see ops/pallas_conv.py benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.ops.pallas_conv import conv3d_bias_relu, conv3d_reference


@pytest.mark.parametrize(
    "shape,ci,co,d,block",
    [
        ((12, 12, 16), 8, 16, 1, (4, 4)),
        ((14, 13, 20), 4, 8, 1, (4, 4)),
        ((16, 16, 24), 8, 8, 2, (4, 4)),
        ((10, 18, 16), 8, 8, 1, (8, 8)),  # partial edge blocks
    ],
)
def test_matches_lax(rng, shape, ci, co, d, block):
    x = jnp.asarray(rng.normal(0, 1, (*shape, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, ci, co)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, co).astype(np.float32))
    ref = conv3d_reference(x, w, b, d)
    got = conv3d_bias_relu(x, w, b, dilation=d, block=block, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_relu_and_bias_applied(rng):
    x = jnp.asarray(rng.normal(0, 1, (8, 8, 12, 4)).astype(np.float32))
    w = jnp.zeros((3, 3, 3, 4, 8), jnp.float32)
    b = jnp.asarray(np.arange(-4, 4, dtype=np.float32))
    got = conv3d_bias_relu(x, w, b, interpret=True)
    # zero weights -> output is relu(bias) everywhere
    expected = np.maximum(np.arange(-4, 4, dtype=np.float32), 0)
    np.testing.assert_allclose(np.asarray(got)[0, 0, 0], expected)


def test_too_small_input_raises(rng):
    x = jnp.zeros((2, 2, 2, 4))
    w = jnp.zeros((3, 3, 3, 4, 8))
    with pytest.raises(ValueError):
        conv3d_bias_relu(x, w, jnp.zeros(8), interpret=True)


@pytest.mark.parametrize("im2col", [True, False])
def test_both_formulations_match(rng, im2col):
    x = jnp.asarray(rng.normal(0, 1, (12, 12, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, 16).astype(np.float32))
    ref = conv3d_reference(x, w, b, 1)
    got = conv3d_bias_relu(x, w, b, block=(4, 4), interpret=True,
                           im2col=im2col)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
