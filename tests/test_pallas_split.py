"""Pallas parity-split relayout kernel == the production XLA spelling,
bitwise (it is a pure copy).  Runs in interpreter mode on CPU; the same
kernel compiles on real TPU (experiments/psplit_pallas.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.ops.pallas_split import (
    parity_split_pallas,
    parity_split_xla,
)


@pytest.mark.parametrize(
    "shape",
    [
        (1, 4, 4, 4, 8),
        (3, 6, 5, 7, 16),
        (2, 3, 3, 3, 256),  # production channel width
    ],
)
def test_matches_xla_spelling_bitwise(shape, rng):
    x = jnp.asarray(rng.random(shape).astype(np.float32))
    ref = np.asarray(parity_split_xla(x))
    for variant in ("slices", "dma"):
        got = np.asarray(
            parity_split_pallas(x, interpret=True, variant=variant)
        )
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_matches_packed_conv_split(rng):
    """Same values as PackedConvStack.apply_stage_a's inline spelling
    (batch-major, parity-minor ordering feeding parity_merge)."""
    from flypylib_tpu.ops.packed_conv import parity_merge

    x = jnp.asarray(rng.random((2, 4, 4, 4, 24)).astype(np.float32))
    y = parity_split_pallas(x, interpret=True)
    # round-trip through parity_merge recovers the cell-major layout of
    # unpack: merge(split(x)) == unpack-equivalent of the packed tensor
    m = parity_merge(y)
    from flypylib_tpu.ops.packed_conv import unpack_volume

    np.testing.assert_array_equal(np.asarray(m), np.asarray(unpack_volume(x)))
