"""Device NMS / CC vs the host scipy reference — identical detection lists
(SURVEY.md section 4 item 2: cross-checks incl. tie-breaking)."""

import numpy as np
import pytest

from flypylib_tpu.ops.components import label_components
from flypylib_tpu.ops.host_reference import components_host, nms_host
from flypylib_tpu.ops.nms import nms
from tests.conftest import make_blob_volume


def _canonical(t):
    """Order-robust canonicalization: sort by rounded (z, y, x) then conf,
    so f32-vs-f64 centroid rounding can't flip the order of near-ties."""
    locs = np.round(np.asarray(t.locs, np.float64), 3)
    conf = np.round(np.asarray(t.conf, np.float64), 5)
    order = np.lexsort((conf, locs[:, 2], locs[:, 1], locs[:, 0]))
    return t.locs[order], t.conf[order]


def assert_same_detections(a, b, loc_tol=0.0):
    assert len(a) == len(b)
    a_locs, a_conf = _canonical(a)
    b_locs, b_conf = _canonical(b)
    if loc_tol == 0.0:
        np.testing.assert_array_equal(a_locs, b_locs)
    else:
        np.testing.assert_allclose(a_locs, b_locs, atol=loc_tol)
    np.testing.assert_allclose(a_conf, b_conf, rtol=1e-6)


def test_nms_matches_host_on_blobs(blob_volume):
    vol, centers = blob_volume
    host = nms_host(vol, window=3, threshold=0.5)
    dev = nms(vol, window=3, threshold=0.5)
    assert_same_detections(host, dev)
    # peaks are at the blob centers
    np.testing.assert_array_equal(
        np.sort(host.locs, axis=0), np.sort(centers, axis=0)
    )


def test_nms_plateau_ties(rng):
    vol = np.zeros((16, 16, 16), dtype=np.float32)
    vol[5, 5, 5:8] = 0.9  # 3-voxel plateau
    host = nms_host(vol, window=3, threshold=0.5)
    dev = nms(vol, window=3, threshold=0.5)
    # every plateau voxel is a candidate in both paths, same order
    assert len(host) == 3
    assert_same_detections(host, dev)


def test_nms_edge_maxima():
    vol = np.zeros((12, 12, 12), dtype=np.float32)
    vol[0, 0, 0] = 0.7  # corner voxel is a local max (-inf out of bounds)
    host = nms_host(vol, window=3, threshold=0.5)
    dev = nms(vol, window=3, threshold=0.5)
    assert len(host) == 1
    np.testing.assert_array_equal(host.locs[0], [0, 0, 0])
    assert_same_detections(host, dev)


def test_nms_random_volume_exact(rng):
    vol = rng.random((32, 32, 32)).astype(np.float32)
    host = nms_host(vol, window=3, threshold=0.8)
    dev = nms(vol, window=3, threshold=0.8)
    assert len(host) > 0
    assert_same_detections(host, dev)


@pytest.mark.parametrize("window", [3, 5, (3, 5, 7)])
def test_nms_window_shapes(rng, window):
    vol = rng.random((24, 24, 24)).astype(np.float32)
    assert_same_detections(
        nms_host(vol, window=window, threshold=0.7),
        nms(vol, window=window, threshold=0.7),
    )


def test_nms_overflow_grows():
    vol = np.zeros((8, 8, 8), dtype=np.float32)
    vol[::2, ::2, ::2] = 0.9  # 64 isolated maxima
    host = nms_host(vol, window=2, threshold=0.5)
    # default (no cap): auto-grows past saturation, complete list
    dev = nms(vol, window=2, threshold=0.5)
    assert_same_detections(host, dev)
    # explicit cap: truly bounds the result (top-k) and warns
    with pytest.warns(UserWarning, match="max_detections"):
        capped = nms(vol, window=2, threshold=0.5, max_detections=8)
    assert len(capped) == 8


def test_components_simple_blobs(blob_volume):
    vol, centers = blob_volume
    host = components_host(vol, threshold=0.5)
    dev = label_components(vol, threshold=0.5)
    assert len(host) == len(centers)
    assert_same_detections(host, dev, loc_tol=1e-4)


def test_components_touching_vs_separate():
    vol = np.zeros((20, 20, 20), dtype=np.float32)
    vol[5, 5, 5] = 0.9
    vol[5, 5, 6] = 0.8  # 6-connected with above -> same component
    vol[5, 6, 6] = 0.7  # 6-connected chain
    vol[10, 10, 10] = 0.6  # separate
    vol[11, 11, 11] = 0.6  # diagonal only -> separate under 6-connectivity
    host = components_host(vol, threshold=0.5)
    dev = label_components(vol, threshold=0.5)
    assert len(host) == 3
    assert_same_detections(host, dev, loc_tol=1e-4)


def test_components_random_exact_count(rng):
    vol = (rng.random((24, 24, 24)) > 0.7).astype(np.float32)
    host = components_host(vol, threshold=0.5)
    dev = label_components(vol, threshold=0.5, max_components=64)
    assert_same_detections(host, dev, loc_tol=1e-3)


def test_components_empty():
    vol = np.zeros((8, 8, 8), dtype=np.float32)
    assert len(label_components(vol, threshold=0.5)) == 0
    assert len(components_host(vol, threshold=0.5)) == 0


@pytest.mark.parametrize("pointer_jump,sweeps", [(True, 1), (False, 1),
                                                 (True, 4), (False, 8)])
def test_components_variants_match(rng, pointer_jump, sweeps):
    """Label-propagation variants (pointer jumping / sweep chunking) all
    converge to the same components as scipy."""
    from flypylib_tpu.ops.components import components_device
    from flypylib_tpu.ops.host_reference import sort_detections

    vol = (rng.random((20, 20, 20)) > 0.75).astype(np.float32)
    host = components_host(vol, threshold=0.5)
    cents, conf, valid, over = components_device(
        vol, threshold=0.5, max_components=2048,
        sweeps_per_check=sweeps, pointer_jump=pointer_jump,
    )
    assert not bool(over)
    valid = np.asarray(valid)
    dev = sort_detections(np.asarray(cents)[valid], np.asarray(conf)[valid])
    assert_same_detections(host, dev, loc_tol=1e-3)


def test_components_elongated_snake(rng):
    """High-diameter component (worst case for sweep counts)."""
    vol = np.zeros((4, 4, 64), dtype=np.float32)
    vol[1, 1, :] = 1.0  # 64-voxel line
    vol[1, 3, 10] = 1.0  # separate singleton
    host = components_host(vol, threshold=0.5)
    dev = label_components(vol, threshold=0.5, max_components=16)
    assert len(host) == 2
    assert_same_detections(host, dev, loc_tol=1e-3)


def test_components_candidate_overflow_retries(rng):
    from flypylib_tpu.ops.components import components_device

    vol = (rng.random((16, 16, 16)) > 0.5).astype(np.float32)
    # tiny candidate budget must flag overflow...
    _, _, _, over = components_device(
        vol, threshold=0.5, max_components=4, max_candidates=8
    )
    assert bool(over)
    # ...and the public wrapper retries until exact
    host = components_host(vol, threshold=0.5)
    dev = label_components(vol, threshold=0.5, max_components=4)
    assert_same_detections(host, dev, loc_tol=1e-3)


def test_compact_true_indices_matches_nonzero(rng):
    """The three-level compaction == jnp.nonzero(size=, fill_value=n) for
    every size/pattern class (empty, dense, sparse, block-boundary,
    larger-than-count, non-multiple-of-block lengths)."""
    import jax.numpy as jnp

    from flypylib_tpu.ops.components import compact_true_indices

    cases = []
    for n in (1, 100, 1 << 16, (1 << 16) + 1, 200_000, 299_999):
        cases.append((np.zeros(n, bool), 16))
        cases.append((np.ones(n, bool), 16))
        cases.append((rng.random(n) < 0.01, 64))
        cases.append((rng.random(n) < 0.5, 128))
    # block-boundary pattern: candidates exactly at 128-multiples
    m = np.zeros(200_000, bool)
    m[::128] = True
    cases.append((m, 2000))
    # size exceeding the true count
    m2 = np.zeros(300_000, bool)
    m2[[5, 131071, 131072, 131073, 299_999]] = True
    cases.append((m2, 32))
    for mask, size in cases:
        n = mask.shape[0]
        want = np.asarray(
            jnp.nonzero(jnp.asarray(mask), size=min(size, n),
                        fill_value=n)[0]
        )
        got = np.asarray(
            compact_true_indices(jnp.asarray(mask), min(size, n))
        )
        np.testing.assert_array_equal(got, want)
