"""Property-based fuzzing: device NMS/CC == scipy reference on arbitrary
volumes (hypothesis drives shapes, thresholds, windows, and content)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from flypylib_tpu.ops.components import label_components
from flypylib_tpu.ops.host_reference import components_host, nms_host
from flypylib_tpu.ops.nms import nms
from tests.test_detect_ops import assert_same_detections


volumes = st.builds(
    lambda seed, dz, dy, dx, sparsity: (
        np.random.default_rng(seed).random((dz, dy, dx)).astype(np.float32),
        sparsity,
    ),
    seed=st.integers(0, 2**31 - 1),
    dz=st.integers(4, 20),
    dy=st.integers(4, 20),
    dx=st.integers(4, 20),
    sparsity=st.floats(0.5, 0.99),
)


@settings(max_examples=15, deadline=None)
@given(vol_s=volumes, window=st.sampled_from([2, 3, 5]))
def test_nms_fuzz(vol_s, window):
    vol, sparsity = vol_s
    thr = float(np.quantile(vol, sparsity))
    assert_same_detections(
        nms_host(vol, window=window, threshold=thr),
        nms(vol, window=window, threshold=thr),
    )


@settings(max_examples=10, deadline=None)
@given(vol_s=volumes)
def test_components_fuzz(vol_s):
    vol, sparsity = vol_s
    thr = float(np.quantile(vol, max(sparsity, 0.7)))
    host = components_host(vol, threshold=thr)
    dev = label_components(vol, threshold=thr, max_components=64)
    assert_same_detections(host, dev, loc_tol=1e-3)
