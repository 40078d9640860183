"""Tiled inference == monolithic inference, bitwise (SURVEY.md section 4
item 3 — the stitching guardrail)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.infer.tiled import TiledInference
from flypylib_tpu.models.zoo import baseline_model, unet


def monolithic(spec, variables, vol):
    """Reference: pad whole volume by context, single forward pass."""
    c = spec.context
    padded = np.pad(vol, c, mode="reflect")
    x = jnp.asarray(padded[None, ..., None], dtype=jnp.float32)
    logits = spec.module.apply(variables, x, train=False)
    return np.asarray(jax.nn.sigmoid(logits[0, ..., 0]))


@pytest.fixture(scope="module")
def small_model():
    spec = baseline_model(features=(4, 6), dilations=(1, 2),
                          head_features=8, dtype=jnp.float32)
    variables = spec.init(jax.random.PRNGKey(0), 16)
    return spec, variables


def test_tiled_equals_monolithic_exact(small_model, rng):
    spec, variables = small_model
    vol = rng.random((40, 40, 40)).astype(np.float32)
    mono = monolithic(spec, variables, vol)
    for tile_out, batch in [(16, 1), (16, 4), (24, 2)]:
        eng = TiledInference(spec, variables, tile_out=tile_out,
                             tile_batch=batch)
        tiled = eng.infer(vol)
        assert tiled.shape == vol.shape
        np.testing.assert_array_equal(tiled, mono)


def test_tiled_nondivisible_shapes(small_model, rng):
    spec, variables = small_model
    vol = rng.random((37, 29, 41)).astype(np.float32)
    mono = monolithic(spec, variables, vol)
    eng = TiledInference(spec, variables, tile_out=16, tile_batch=3)
    np.testing.assert_array_equal(eng.infer(vol), mono)


def test_tiled_volume_smaller_than_tile(small_model, rng):
    spec, variables = small_model
    vol = rng.random((12, 12, 12)).astype(np.float32)
    mono = monolithic(spec, variables, vol)
    eng = TiledInference(spec, variables, tile_out=32)
    np.testing.assert_array_equal(eng.infer(vol), mono)


def test_tiled_keep_on_device(small_model, rng):
    spec, variables = small_model
    vol = rng.random((20, 20, 20)).astype(np.float32)
    eng = TiledInference(spec, variables, tile_out=16)
    out = eng.infer(vol, keep_on_device=True)
    assert isinstance(out, jax.Array)
    np.testing.assert_array_equal(np.asarray(out), eng.infer(vol))


def test_tiled_unet(rng):
    spec = unet(base_features=4, levels=1, convs_per_stage=1,
                dtype=jnp.float32)
    s = spec.valid_size(24)
    variables = spec.init(jax.random.PRNGKey(0), s)
    vol = rng.random((30, 30, 30)).astype(np.float32)
    mono = monolithic(spec, variables, vol)
    eng = TiledInference(spec, variables, tile_out=12)
    np.testing.assert_array_equal(eng.infer(vol), mono)


def test_host_stream_equals_device_path(small_model, rng):
    """The double-buffered host-feed path (for volumes too big to hold
    padded input + output in HBM) matches the single-dispatch path."""
    spec, variables = small_model
    vol = rng.random((30, 25, 33)).astype(np.float32)
    eng = TiledInference(spec, variables, tile_out=16, tile_batch=2)
    on_dev = eng.infer(vol)
    streamed = eng.infer(vol, host_stream=True)
    np.testing.assert_array_equal(on_dev, streamed)
