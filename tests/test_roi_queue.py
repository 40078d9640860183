"""Multi-ROI streaming queue: coverage, resume, DVID round-trip."""

import numpy as np
import pytest

from flypylib_tpu.infer.roi_queue import (
    ROI,
    ROIQueue,
    grid_rois,
    stream_rois,
)
from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.ops.host_reference import nms_host


def fake_pipeline(vol):
    det = nms_host(vol.astype(np.float32), window=3, threshold=0.5)
    return det, None


def test_grid_rois_cover():
    rois = grid_rois((40, 40, 40), 16)
    covered = np.zeros((40, 40, 40), dtype=bool)
    for r in rois:
        sl = tuple(slice(o, o + s) for o, s in zip(r.offset, r.size))
        covered[sl] = True
    assert covered.all()


def test_stream_and_resume(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.random((32, 16, 16)).astype(np.float32)
    rois = grid_rois(vol.shape, (16, 16, 16))
    assert len(rois) == 2

    def source(roi):
        sl = tuple(slice(o, o + s) for o, s in zip(roi.offset, roi.size))
        return vol[sl]

    state = str(tmp_path / "state.json")
    calls = []
    res = stream_rois(fake_pipeline, rois, source, state_path=state,
                      progress=lambda r, i: calls.append(r.key))
    assert len(res) == 2 and len(calls) == 2

    # resume: everything done -> nothing re-processed
    res2 = stream_rois(fake_pipeline, rois, source, state_path=state)
    assert res2 == {}

    # partial resume: mark one pending again
    q = ROIQueue(rois, state)
    q.state[rois[0].key]["status"] = "pending"
    q._persist()
    res3 = stream_rois(fake_pipeline, rois, source, state_path=state)
    assert list(res3) == [rois[0].key]


def test_fetch_error_surfaces():
    rois = [ROI(offset=(0, 0, 0), size=(4, 4, 4))]

    def bad_source(roi):
        raise IOError("boom")

    with pytest.raises(RuntimeError, match="fetch failed"):
        stream_rois(fake_pipeline, rois, bad_source)


def test_sink_receives_global_coords(tmp_path):
    vol = np.zeros((8, 8, 8), dtype=np.float32)
    vol[2, 3, 4] = 0.9
    rois = [ROI(offset=(100, 200, 300), size=(8, 8, 8))]
    got = []

    from flypylib_tpu.infer.roi_queue import dvid_sink

    class FakeClient:
        def post_annotations(self, instance, tbars):
            got.append(tbars)

    sink = dvid_sink(FakeClient(), "syn")
    stream_rois(fake_pipeline, rois, lambda r: vol, sink=sink)
    assert len(got) == 1
    np.testing.assert_array_equal(got[0].locs[0], [102, 203, 304])


def test_grid_rois_ownership_partition():
    """Every voxel is owned by exactly one ROI even when fetches overlap."""
    rois = grid_rois((100, 64, 70), 64)
    owned = np.zeros((100, 64, 70), dtype=np.int32)
    for r in rois:
        lo, hi = r.owned()
        owned[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] += 1
    assert (owned == 1).all()


def test_stream_rois_no_duplicates_in_overlap():
    """A detection inside two overlapping fetch boxes is reported once."""
    vol = np.zeros((100, 16, 16), dtype=np.float32)
    vol[50, 8, 8] = 0.9  # inside both z ROIs' fetch ([0,64) and [36,100))
    vol[10, 4, 4] = 0.8
    vol[90, 4, 4] = 0.7
    rois = grid_rois(vol.shape, (64, 16, 16))
    assert len(rois) == 2

    def source(roi):
        sl = tuple(slice(o, o + s) for o, s in zip(roi.offset, roi.size))
        return vol[sl]

    def sink_count(results):
        return sum(len(v) for v in results.values())

    res = stream_rois(fake_pipeline, rois, source)
    assert sink_count(res) == 3
