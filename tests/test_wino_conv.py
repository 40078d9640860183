"""Winograd F(2,3)^3 Pallas kernel == lax conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from flypylib_tpu.ops.wino_conv import (
    wino_conv3d_bias_relu,
    wino_transform_weights,
)

_INTERPRET = jax.default_backend() != "tpu"


def _reference(x, w, b, relu=True):
    out = lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + b
    return jnp.maximum(out, 0.0) if relu else out


@pytest.mark.parametrize(
    "shape,block",
    [
        ((1, 8, 8, 8, 3, 5), (4, 4)),
        ((2, 10, 12, 14, 4, 6), (4, 6)),
        ((1, 18, 16, 20, 8, 16), (8, 8)),
        ((3, 6, 6, 6, 1, 2), (8, 16)),  # block > dims: clamped
        ((1, 6, 22, 8, 2, 3), (2, 4)),  # non-dividing grid: edge shift
    ],
)
def test_wino_matches_lax(rng, shape, block):
    n, d, h, w, ci, co = shape
    x = jnp.asarray(rng.normal(0, 1, (n, d, h, w, ci)).astype(np.float32))
    wgt = jnp.asarray(
        rng.normal(0, 0.5, (3, 3, 3, ci, co)).astype(np.float32)
    )
    b = jnp.asarray(rng.normal(0, 0.5, (co,)).astype(np.float32))
    ref = _reference(x, wgt, b)
    got = wino_conv3d_bias_relu(
        x, wino_transform_weights(wgt), b, block=block,
        interpret=_INTERPRET,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_wino_no_relu(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8, 4)).astype(np.float32))
    wgt = jnp.asarray(
        rng.normal(0, 0.5, (3, 3, 3, 4, 4)).astype(np.float32)
    )
    b = jnp.zeros((4,), jnp.float32)
    ref = _reference(x, wgt, b, relu=False)
    got = wino_conv3d_bias_relu(
        x, wino_transform_weights(wgt), b, relu=False,
        interpret=_INTERPRET,
    )
    assert float(got.min()) < 0  # relu really off
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_wino_rejects_odd_dims(rng):
    x = jnp.zeros((1, 7, 8, 8, 2))
    u = jnp.zeros((64, 2, 2))
    with pytest.raises(ValueError, match="even"):
        wino_conv3d_bias_relu(x, u, jnp.zeros((2,)),
                              interpret=_INTERPRET)


def test_wino_bf16_tolerance(rng):
    """bf16 winograd stays within a few bf16 ULPs of the bf16 direct
    conv (transform sums and products round to bf16 — the same error
    class, slightly amplified by the transform's cancellations)."""
    x32 = rng.normal(0, 1, (1, 12, 12, 12, 8)).astype(np.float32)
    wgt = rng.normal(0, 0.3, (3, 3, 3, 8, 8)).astype(np.float32)
    b = rng.normal(0, 0.1, (8,)).astype(np.float32)
    ref = _reference(
        jnp.asarray(x32, jnp.bfloat16),
        jnp.asarray(wgt, jnp.bfloat16),
        jnp.asarray(b),
    ).astype(np.float32)
    got = wino_conv3d_bias_relu(
        jnp.asarray(x32, jnp.bfloat16),
        wino_transform_weights(jnp.asarray(wgt)),
        jnp.asarray(b),
        interpret=_INTERPRET,
    ).astype(np.float32)
    scale = float(np.abs(ref).max())
    assert float(np.abs(got - ref).max()) < 0.05 * scale
