import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.models.zoo import ModelSpec, baseline_model, unet, vgg_like


def tiny_baseline():
    return baseline_model(features=(4, 4), dilations=(1, 1), head_features=8,
                          dtype=jnp.float32)


def test_baseline_context_and_shapes():
    spec = tiny_baseline()
    assert spec.context == 2
    params = spec.init(jax.random.PRNGKey(0), 9)
    x = jnp.zeros((1, 9, 9, 9, 1))
    out = spec.apply(params, x)
    assert out.shape == (1, 5, 5, 5, 1)
    assert out.dtype == jnp.float32


def test_vgg_context():
    spec = vgg_like(features=(4, 4, 4), dilations=(1, 2, 2), head_features=8,
                    dtype=jnp.float32)
    assert spec.context == 5
    s = 2 * spec.context + 3
    params = spec.init(jax.random.PRNGKey(0), s)
    out = spec.apply(params, jnp.zeros((1, s, s, s, 1)))
    assert out.shape[1] == s - 2 * spec.context


def test_unet_geometry_probe():
    spec = unet(base_features=4, levels=1, convs_per_stage=1, dtype=jnp.float32)
    s = spec.valid_size(20)
    assert spec.is_valid_size(s)
    params = spec.init(jax.random.PRNGKey(0), s)
    out = spec.apply(params, jnp.zeros((1, s, s, s, 1)))
    assert out.shape[1] == s - 2 * spec.context
    # context consistent across a second valid size
    s2 = spec.valid_size(s + 1)
    out2 = spec.apply(
        spec.init(jax.random.PRNGKey(0), s2), jnp.zeros((1, s2, s2, s2, 1))
    )
    assert out2.shape[1] == s2 - 2 * spec.context


def test_valid_size_rounding():
    spec = ModelSpec(name="t", module=None, context=3, size_multiple=4,
                     size_offset=2, min_size=10)
    assert spec.valid_size(10) == 10
    assert spec.valid_size(11) == 14
    assert spec.valid_size(3) == 10


def test_translation_equivariance():
    """Valid convs: shifting input shifts output — the stitching guarantee."""
    spec = tiny_baseline()
    params = spec.init(jax.random.PRNGKey(1), 12)
    rng = np.random.default_rng(0)
    vol = rng.random((1, 16, 16, 16, 1)).astype(np.float32)
    full = spec.apply(params, jnp.asarray(vol))
    sub = spec.apply(params, jnp.asarray(vol[:, 2:14, 2:14, 2:14, :]))
    np.testing.assert_array_equal(
        np.asarray(full)[:, 2:10, 2:10, 2:10, :], np.asarray(sub)
    )
