"""Fused single-dispatch detect pipeline == scipy host reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.infer.pipeline import DetectPipeline
from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.host_reference import components_host, nms_host
from tests.test_detect_ops import assert_same_detections


@pytest.fixture(scope="module")
def model():
    spec = baseline_model(features=(4, 6), dilations=(1, 2),
                          head_features=8, dtype=jnp.float32)
    variables = spec.init(jax.random.PRNGKey(0), 16)
    # re-draw ALL params (incl. biases) from a normal so the untrained net
    # produces spatially varying probabilities — default zero biases leave
    # dead-ReLU regions with logits exactly 0, i.e. huge prob-0.5 plateaus
    # that saturate any max_detections
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    variables = jax.tree.unflatten(
        treedef,
        [0.5 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )
    return spec, variables


def reference_prob(spec, variables, vol):
    c = spec.context
    padded = np.pad(vol.astype(np.float32), c, mode="reflect")
    x = jnp.asarray(padded[None, ..., None])
    logits = spec.module.apply(variables, x, train=False)
    return np.asarray(jax.nn.sigmoid(logits[0, ..., 0]))


def test_pipeline_matches_host_reference(model, rng):
    spec, variables = model
    vol = rng.random((36, 36, 36)).astype(np.float32)
    prob = reference_prob(spec, variables, vol)
    thr = float(np.quantile(prob, 0.99))

    pipe = DetectPipeline(spec, variables, vol.shape, tile_out=16,
                          tile_batch=2, window=3, threshold=thr,
                          max_detections=1024, max_components=1024)
    nms_det, cc_det = pipe(vol)
    assert_same_detections(nms_host(prob, window=3, threshold=thr), nms_det)
    assert_same_detections(components_host(prob, threshold=thr), cc_det,
                           loc_tol=1e-3)


def test_pipeline_uint8_input(model, rng):
    spec, variables = model
    vol8 = rng.integers(0, 256, (24, 24, 24)).astype(np.uint8)
    # multiply by the f32 reciprocal (not divide): matches the device's
    # x * (1/255) bit-for-bit
    prob = reference_prob(
        spec, variables,
        vol8.astype(np.float32) * np.float32(1.0 / 255.0),
    )
    thr = float(np.quantile(prob, 0.98))
    pipe = DetectPipeline(spec, variables, vol8.shape, tile_out=16,
                          window=3, threshold=thr, max_detections=512,
                          max_components=128)
    nms_det, _ = pipe(vol8)
    assert_same_detections(nms_host(prob, window=3, threshold=thr), nms_det)


def test_pipeline_no_cc(model, rng):
    spec, variables = model
    vol = rng.random((20, 20, 20)).astype(np.float32)
    pipe = DetectPipeline(spec, variables, vol.shape, tile_out=16,
                          window=3, threshold=0.5, run_cc=False)
    nms_det, cc_det = pipe(vol)
    assert cc_det is None


def test_pipeline_small_volume_default_caps(model, rng):
    """Volumes smaller than the default max_detections no longer crash."""
    spec, variables = model
    vol = rng.random((8, 16, 16)).astype(np.float32)  # 2048 < 4096 default
    pipe = DetectPipeline(spec, variables, vol.shape, tile_out=8, window=3,
                          threshold=0.5)
    nms_det, cc_det = pipe(vol)
    assert nms_det is not None


def test_pipeline_threshold_mutation_takes_effect(model, rng):
    """threshold is traced: changing the attribute affects the next call
    without a rebuild/recompile."""
    spec, variables = model
    vol = rng.random((20, 20, 20)).astype(np.float32)
    from tests.test_pipeline import reference_prob

    prob = reference_prob(spec, variables, vol)
    t_lo = float(np.quantile(prob, 0.90))
    t_hi = float(np.quantile(prob, 0.999))
    pipe = DetectPipeline(spec, variables, vol.shape, tile_out=16, window=3,
                          threshold=t_lo, max_detections=2048,
                          max_components=2048)
    many, _ = pipe(vol)
    pipe.threshold = t_hi
    few, _ = pipe(vol)
    assert len(few) < len(many)
    from flypylib_tpu.ops.host_reference import nms_host
    from tests.test_detect_ops import assert_same_detections
    assert_same_detections(nms_host(prob, window=3, threshold=t_hi), few)


def test_forward_full_equals_forward_staged(model, rng):
    """The fused single-dispatch device-resident path (stage_full +
    forward_full) is bitwise the per-slab staged path."""
    spec, variables = model
    vol = rng.random((24, 20, 18)).astype(np.float32)
    pipe = DetectPipeline(spec, variables, vol.shape, tile_out=12,
                          tile_batch=2, window=3, threshold=0.5)
    a = np.asarray(pipe.forward_staged(pipe.stage(vol)))
    b = np.asarray(pipe.forward_full(pipe.stage_full(vol)))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "shape,tile_out,tile_batch",
    [
        ((24, 20, 18), 12, 2),   # grid extension on y/x
        ((16, 16, 16), 24, 1),   # single slab, tile overshoot
        ((40, 14, 14), 10, 4),   # many slabs, thin xy
    ],
)
def test_raw_chunk_staging_bitwise(model, rng, shape, tile_out, tile_batch):
    """stage() uploads raw z-chunks and builds reflect halo / overlap /
    grid extension on device; every assembled slab must be bitwise
    prepare()'s corresponding window, for uint8 and f32 volumes."""
    from flypylib_tpu.infer.pipeline import _StagedRaw

    spec, variables = model
    for dtype in (np.float32, np.uint8):
        vol = rng.random(shape).astype(np.float32)
        if dtype == np.uint8:
            vol = (vol * 255).astype(np.uint8)
        pipe = DetectPipeline(spec, variables, shape, tile_out=tile_out,
                              tile_batch=tile_batch, window=3,
                              threshold=0.5)
        staged = pipe.stage(vol)
        assert isinstance(staged, _StagedRaw)
        # raw chunks partition the volume exactly (no wire redundancy)
        total = sum(ch.shape[0] for ch in staged.chunks)
        assert total == shape[0]
        assert all(ch.shape[1:] == shape[1:] for ch in staged.chunks)
        padded = pipe.prepare(vol)
        for (zs, _), slab in zip(pipe._slabs, pipe._staged_slabs(staged)):
            np.testing.assert_array_equal(
                np.asarray(slab), padded[zs : zs + pipe._tin]
            )


def test_raw_chunk_staging_fallbacks(model, rng):
    """pre_padded pipelines and volumes smaller than the context fall
    back to host-padded slab uploads (and still match stage_full)."""
    spec, variables = model
    c = spec.context
    vol = rng.random((12, 12, 12)).astype(np.float32)
    pre = np.pad(vol, c, mode="reflect")
    pipe = DetectPipeline(spec, variables, vol.shape, tile_out=12,
                          window=3, threshold=0.5, pre_padded=True)
    assert pipe._raw_plan is None
    staged = pipe.stage(pre)
    assert isinstance(staged, list)
    a = np.asarray(pipe.forward_staged(staged))
    b = np.asarray(pipe.forward_full(pipe.stage_full(pre)))
    np.testing.assert_array_equal(a, b)

    tiny = rng.random((c, c + 2, c + 2)).astype(np.float32)
    pipe2 = DetectPipeline(spec, variables, tiny.shape, tile_out=8,
                           window=3, threshold=0.5)
    assert pipe2._raw_plan is None  # reflect needs every extent > context
    np.testing.assert_array_equal(
        np.asarray(pipe2.forward_staged(pipe2.stage(tiny))),
        np.asarray(pipe2.forward_full(pipe2.stage_full(tiny))),
    )
