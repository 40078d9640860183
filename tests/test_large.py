"""Out-of-core streaming detection == monolithic, bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.infer.large import (
    array_reader,
    detect_h5,
    detect_streaming,
)
from flypylib_tpu.io.hdf5 import write_h5
from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.host_reference import components_host, nms_host
from tests.test_detect_ops import assert_same_detections
from tests.test_pipeline import reference_prob


@pytest.fixture(scope="module")
def model():
    spec = baseline_model(features=(4, 6), dilations=(1, 2),
                          head_features=8, dtype=jnp.float32)
    variables = spec.init(jax.random.PRNGKey(0), 16)
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    variables = jax.tree.unflatten(
        treedef,
        [0.5 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )
    return spec, variables


def test_streaming_equals_monolithic(model, rng):
    spec, variables = model
    vol = rng.random((64, 48, 56)).astype(np.float32)
    prob = reference_prob(spec, variables, vol)
    thr = float(np.quantile(prob, 0.995))
    host = nms_host(prob, window=3, threshold=thr)
    shape, read = array_reader(vol)
    got = detect_streaming(
        spec, variables, shape, read, core=32, tile_out=32,
        window=3, threshold=thr, max_detections_per_roi=1024,
    )
    assert len(host) > 0
    assert_same_detections(host, got)


def test_streaming_nondivisible_cores(model, rng):
    spec, variables = model
    vol = rng.random((50, 41, 47)).astype(np.float32)
    prob = reference_prob(spec, variables, vol)
    thr = float(np.quantile(prob, 0.99))
    host = nms_host(prob, window=5, threshold=thr)
    shape, read = array_reader(vol)
    got = detect_streaming(
        spec, variables, shape, read, core=24, tile_out=24,
        window=5, threshold=thr, max_detections_per_roi=2048,
    )
    assert_same_detections(host, got)


def test_streaming_components_seam_merge(model, rng):
    """Chunked CC with cross-ROI union-find == monolithic scipy label,
    on non-divisible cores (components span ROI seams)."""
    spec, variables = model
    vol = rng.random((50, 41, 47)).astype(np.float32)
    prob = reference_prob(spec, variables, vol)
    thr = float(np.quantile(prob, 0.97))  # large, seam-spanning blobs
    host = components_host(prob, threshold=thr)
    assert len(host) > 0
    shape, read = array_reader(vol)
    got = detect_streaming(
        spec, variables, shape, read, core=24, tile_out=24,
        threshold=thr, method="components",
        max_components_per_roi=4096,
    )
    assert_same_detections(host, got, loc_tol=1e-3)


def test_streaming_components_overflow_grows(model, rng):
    """Tiny per-ROI component budget self-heals via grow-and-retry."""
    spec, variables = model
    vol = rng.random((40, 33, 37)).astype(np.float32)
    prob = reference_prob(spec, variables, vol)
    thr = float(np.quantile(prob, 0.9))  # many components
    host = components_host(prob, threshold=thr)
    shape, read = array_reader(vol)
    got = detect_streaming(
        spec, variables, shape, read, core=20, tile_out=20,
        threshold=thr, method="components",
        max_components_per_roi=4,
    )
    assert_same_detections(host, got, loc_tol=1e-3)


def test_streaming_both_methods(model, rng):
    spec, variables = model
    vol = rng.random((40, 40, 40)).astype(np.float32)
    prob = reference_prob(spec, variables, vol)
    thr = float(np.quantile(prob, 0.99))
    shape, read = array_reader(vol)
    nms_det, cc_det = detect_streaming(
        spec, variables, shape, read, core=24, tile_out=24,
        window=3, threshold=thr, method="both",
    )
    assert_same_detections(nms_host(prob, window=3, threshold=thr), nms_det)
    assert_same_detections(
        components_host(prob, threshold=thr), cc_det, loc_tol=1e-3
    )


def test_detect_h5_roundtrip(model, rng, tmp_path):
    spec, variables = model
    vol = rng.random((48, 48, 48)).astype(np.float32)
    prob = reference_prob(spec, variables, vol)
    thr = float(np.quantile(prob, 0.995))
    path = str(tmp_path / "vol.h5")
    write_h5(path, vol)
    got = detect_h5(
        spec, variables, path, core=32, tile_out=32, window=3,
        threshold=thr, max_detections_per_roi=1024,
    )
    host = nms_host(prob, window=3, threshold=thr)
    assert_same_detections(host, got)
