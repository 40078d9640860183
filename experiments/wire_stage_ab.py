"""A/B: raw-chunk staging vs padded-slab staging on the 256^3 wire path.

The raw-chunk stage() uploads only the volume's own bytes (disjoint
z-chunks; reflect halo / inter-slab overlap / grid extension built on
device) — at 256^3 t64b16 the padded-slab path moves ~23% more bytes
through the ~38 MB/s tunnel.  Times the full wire pipeline
(stage + forward + postprocess + download) min-of-5 both ways.

python experiments/wire_stage_ab.py [size]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from flypylib_tpu.infer.pipeline import DetectPipeline, _StagedRaw


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from bench import _flagship, make_volume

    pspec, variables = _flagship()
    vol = (make_volume(size, n_blobs=max(8, size // 16)) * 255).astype(
        np.uint8
    )
    q = 1.0 - 2000.0 / vol.size
    pipe = DetectPipeline(
        pspec, variables, vol.shape, tile_out=64, tile_batch=16,
        window=5, threshold_quantile=q,
        max_detections=4096, max_components=4096,
    )

    def legacy_stage(volume):
        padded = pipe.prepare(volume)
        tin = pipe._tin
        return [
            jax.device_put(padded[zs : zs + tin]) for zs, _ in pipe._slabs
        ]

    rows = []

    def rec(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/wire_stage_ab.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    assert isinstance(pipe.stage(vol), _StagedRaw)
    ref = pipe(vol)  # warm/compile (raw path)
    pipe.postprocess(pipe.forward_staged(legacy_stage(vol)))  # warm legacy

    for name, stage_fn in [("raw-chunk", pipe.stage),
                           ("padded-slab", legacy_stage)]:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = pipe.postprocess(
                pipe.forward_staged(stage_fn(vol)),
            )
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rec({"name": name, "seconds": round(dt, 4),
             "mvox_s": round(vol.size / dt / 1e6, 1),
             "all": [round(t, 3) for t in times],
             "nms": len(out[0]), "cc": len(out[1])})

    # detections identical both ways
    a = pipe(vol)
    b = pipe.postprocess(pipe.forward_staged(legacy_stage(vol)))
    assert len(a[0]) == len(b[0]) and len(a[1]) == len(b[1])
    np.testing.assert_array_equal(a[0].locs, b[0].locs)
    np.testing.assert_array_equal(a[1].locs, b[1].locs)
    print("raw == legacy detections: OK", flush=True)


if __name__ == "__main__":
    main()
