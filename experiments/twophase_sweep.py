"""Tile/batch re-sweep under the two-phase slab forward (round 3).

The t64b16 operating point was chosen under the single-dispatch fused
regime; the two-phase split changes the per-dispatch working set (phase A
materializes a whole slab's stage-A activations), so the optimum may have
moved.  Times a 528^3 device-resident forward (the 1k^3 sweep's ROI
shape) per (tile_out, tile_batch).

python experiments/twophase_sweep.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from bench import _flagship, make_volume_u8
    from flypylib_tpu.infer.pipeline import DetectPipeline

    pspec, variables = _flagship()
    vol = make_volume_u8(528, n_blobs=64)
    out_path = "experiments/twophase_sweep.jsonl"
    open(out_path, "w").close()
    # 528-divisor tiles only (the production plan picks the divisor
    # nearest 64 -> 66): non-divisors overshoot the grid (64 -> 9^2
    # tiles/slab vs 66 -> 8^2, +27% wasted conv FLOPs — first sweep run)
    for tile_out, tile_batch in [(66, 16), (66, 32), (88, 8), (88, 16),
                                 (48, 16), (132, 4), (66, 64)]:
        row = {"tile_out": tile_out, "tile_batch": tile_batch}
        try:
            pipe = DetectPipeline(
                pspec, variables, vol.shape, tile_out=tile_out,
                tile_batch=tile_batch, window=5, threshold=0.9,
                max_detections=4096, max_components=4096, run_cc=False,
            )
            staged = pipe.stage_full(vol)
            out = pipe.forward_full(staged)  # warm/compile
            np.asarray(jax.device_get(out[:1, :1, :1]))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = pipe.forward_full(staged)
                np.asarray(jax.device_get(out[:1, :1, :1]))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            row.update(seconds=round(dt, 4),
                       mvox_s=round(vol.size / dt / 1e6, 1))
        except Exception as e:  # noqa: BLE001 — record and continue
            row["error"] = str(e)[:200]
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
