"""Elastic multi-worker ROI streaming demo (pod-scale pattern, [B:11]).

Simulates a 2-host pod on one machine: two workers share a filesystem
ROI queue (flypylib_tpu.infer.elastic), split a synthetic volume's ROI
grid between them, and one worker "crashes" halfway — the survivor
reclaims the orphaned leases and finishes the job.  On a real pod every
host runs stream_rois_elastic with the same state_dir (NFS/GCS) and its
own DetectPipeline; jax.process_index() becomes the worker id.

Run: python examples/elastic_workers.py
"""

from __future__ import annotations

import tempfile
import threading

import jax
import numpy as np

from flypylib_tpu.infer.elastic import SharedROIQueue, stream_rois_elastic
from flypylib_tpu.infer.pipeline import DetectPipeline
from flypylib_tpu.infer.roi_queue import grid_rois
from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.packed_conv import packed_spec


def main():
    spec = packed_spec(baseline_model())
    variables = spec.init(jax.random.PRNGKey(0), 64)
    rng = np.random.default_rng(0)
    size, roi = 192, 64
    vol = rng.integers(0, 256, (size,) * 3).astype(np.uint8)
    rois = grid_rois(size, roi)
    print(f"{len(rois)} ROIs of {roi}^3 over a {size}^3 volume")

    pipe = DetectPipeline(
        spec, variables, (roi,) * 3, tile_out=roi,
        threshold_quantile=1.0 - 500.0 / roi**3, run_cc=False,
    )

    def source(r):
        sl = tuple(slice(o, o + s) for o, s in zip(r.offset, r.size))
        return vol[sl]

    state_dir = tempfile.mkdtemp(prefix="elastic_rois_")
    done = {}

    def worker(name, crash_after=None):
        n = [0]

        def guard(v):
            n[0] += 1
            if crash_after is not None and n[0] > crash_after:
                raise RuntimeError(f"{name} simulated crash")
            return pipe(v)

        try:
            res = stream_rois_elastic(
                guard, rois, source, state_dir=state_dir,
                worker_id=name, lease_s=0.5, n_workers_hint=2,
            )
            done[name] = res
            print(f"{name}: processed {len(res)} ROIs")
        except RuntimeError as e:
            print(f"{name}: {e} (leases left for the survivor)")

    ta = threading.Thread(target=worker, args=("hostA", 5))
    tb = threading.Thread(target=worker, args=("hostB",))
    ta.start()
    ta.join()
    tb.start()
    tb.join()

    q = SharedROIQueue(state_dir, worker_id="audit")
    summary = q.summary()
    total = sum(r["nms_detections"] for r in summary.values())
    assert len(summary) == len(rois), "every ROI must be done exactly once"
    print(f"all {len(summary)} ROIs done, {total} detections; state in "
          f"{state_dir}")


if __name__ == "__main__":
    main()
