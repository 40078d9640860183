import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.ops.augment import (
    AUGMENT_GROUP_SIZE,
    augment_batch,
    augment_patch,
)


def ref_augment(patch, code):
    out = patch
    if code & 1:
        out = out[::-1]
    if code & 2:
        out = out[:, ::-1]
    if code & 4:
        out = out[:, :, ::-1]
    if code & 8:
        out = np.swapaxes(out, 1, 2)
    return out


def test_all_16_codes_match_reference(rng):
    patch = rng.random((4, 6, 6)).astype(np.float32)
    for code in range(AUGMENT_GROUP_SIZE):
        got = np.asarray(augment_patch(jnp.asarray(patch), jnp.int32(code)))
        np.testing.assert_array_equal(got, ref_augment(patch, code))


def test_group_is_closed_and_distinct(rng):
    patch = rng.random((5, 5, 5)).astype(np.float32)
    outs = {
        np.asarray(
            augment_patch(jnp.asarray(patch), jnp.int32(c))
        ).tobytes()
        for c in range(16)
    }
    assert len(outs) == 16  # all distinct for a generic patch


def test_batch_augment(rng):
    batch = rng.random((16, 4, 4, 4)).astype(np.float32)
    codes = jnp.arange(16, dtype=jnp.int32)
    out = np.asarray(augment_batch(jnp.asarray(batch), codes))
    for i in range(16):
        np.testing.assert_array_equal(out[i], ref_augment(batch[i], i))


def test_nonsquare_xy_rejected():
    with pytest.raises(ValueError):
        augment_patch(jnp.zeros((4, 5, 6)), jnp.int32(0))
