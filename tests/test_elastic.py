"""Elastic multi-worker ROI queue: exactly-once completion across
concurrent workers, crash recovery via lease stealing."""

import threading

import numpy as np
import pytest

from flypylib_tpu.infer.elastic import (
    SharedROIQueue,
    stream_rois_elastic,
)
from flypylib_tpu.infer.roi_queue import grid_rois
from flypylib_tpu.io.synapses import Tbars


def fake_pipeline(counter=None, crash_after=None):
    """Callable (volume) -> (Tbars, None); counts invocations."""
    lock = threading.Lock()

    def run(vol):
        if counter is not None:
            with lock:
                counter[0] += 1
                if crash_after is not None and counter[0] > crash_after:
                    raise RuntimeError("worker died")
        # one detection at the block center
        c = [s // 2 for s in vol.shape]
        return Tbars(locs=np.asarray([c], np.float64),
                     conf=np.asarray([float(vol.max())])), None

    return run


def make_source(size=64):
    rng = np.random.default_rng(0)
    vol = rng.random((size, size, size)).astype(np.float32)

    def source(roi):
        sl = tuple(
            slice(o, o + s) for o, s in zip(roi.offset, roi.size)
        )
        return vol[sl]

    return source


def test_two_workers_disjoint_exactly_once(tmp_path):
    rois = grid_rois(64, 16)  # 64 ROIs
    source = make_source()
    state = str(tmp_path / "q")
    results = {}
    counters = [[0], [0]]

    def worker(i):
        res = stream_rois_elastic(
            fake_pipeline(counters[i]), rois, source,
            state_dir=state, worker_id=f"w{i}", n_workers_hint=2,
        )
        results[i] = res

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    keys0, keys1 = set(results[0]), set(results[1])
    assert keys0.isdisjoint(keys1)
    assert len(keys0 | keys1) == len(rois)  # every ROI done exactly once
    assert counters[0][0] + counters[1][0] == len(rois)
    q = SharedROIQueue(state, worker_id="check")
    assert len(q.summary()) == len(rois)


def test_crash_recovery_lease_steal(tmp_path):
    rois = grid_rois(48, 16)  # 27 ROIs
    source = make_source(48)
    state = str(tmp_path / "q")

    # worker A dies after 5 ROIs, leaving a stale claim on the 6th
    counter = [0]
    with pytest.raises(RuntimeError, match="died"):
        stream_rois_elastic(
            fake_pipeline(counter, crash_after=5), rois, source,
            state_dir=state, worker_id="wA", n_workers_hint=1,
        )
    q = SharedROIQueue(state, worker_id="check")
    assert len(q.summary()) == 5

    # worker B with an expired-lease policy finishes everything
    res = stream_rois_elastic(
        fake_pipeline(), rois, source,
        state_dir=state, worker_id="wB", lease_s=0.0, n_workers_hint=1,
    )
    assert len(res) == len(rois) - 5
    assert len(q.summary()) == len(rois)


def test_resume_skips_done(tmp_path):
    rois = grid_rois(32, 16)  # 8 ROIs
    source = make_source(32)
    state = str(tmp_path / "q")
    first = stream_rois_elastic(
        fake_pipeline(), rois, source, state_dir=state, worker_id="w0",
        n_workers_hint=1,
    )
    assert len(first) == len(rois)
    again = stream_rois_elastic(
        fake_pipeline(), rois, source, state_dir=state, worker_id="w0",
        n_workers_hint=1,
    )
    assert again == {}  # nothing left


def test_ownership_filtering(tmp_path):
    """Detections outside the owned box are dropped (no double report)."""
    rois = grid_rois(24, 16)  # overlapping edge ROIs, owned boxes disjoint
    source = make_source(24)

    def pipe(vol):
        # detections at every corner of the fetched block
        locs = np.asarray(
            [[0, 0, 0], [15, 15, 15], [8, 8, 8]], np.float64
        )
        return Tbars(locs=locs, conf=np.asarray([0.5, 0.6, 0.7])), None

    res = stream_rois_elastic(
        pipe, rois, source, state_dir=str(tmp_path / "q"),
        worker_id="w0", n_workers_hint=1,
    )
    total = []
    for roi in rois:
        det = res[roi.key]
        glob = det.locs + np.asarray(roi.offset, np.float64)
        total.extend(map(tuple, glob))
    assert len(total) == len(set(total))  # nothing double-reported


def test_heartbeat_prevents_steal_of_live_worker(tmp_path):
    """A live worker processing an ROI longer than the lease keeps its
    claim via the background heartbeat — no steal, no duplicate work."""
    import time

    rois = grid_rois(32, 16)  # 8 ROIs
    source = make_source(32)
    state = str(tmp_path / "q")
    counters = [[0], [0]]
    lock = threading.Lock()

    def slow_pipeline(i):
        def run(vol):
            with lock:
                counters[i][0] += 1
            time.sleep(1.0)  # far longer than the 0.4 s lease
            c = [s // 2 for s in vol.shape]
            return Tbars(locs=np.asarray([c], np.float64),
                         conf=np.asarray([1.0])), None

        return run

    results = {}

    def worker(i):
        results[i] = stream_rois_elastic(
            slow_pipeline(i), rois, source, state_dir=state,
            worker_id=f"w{i}", lease_s=0.4, n_workers_hint=2,
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # every ROI processed exactly once despite each taking 2.5 leases
    assert counters[0][0] + counters[1][0] == len(rois)
    assert set(results[0]).isdisjoint(set(results[1]))
    assert len(set(results[0]) | set(results[1])) == len(rois)
