"""Tile sweep for the SHARED whole-volume conv-stack forward at 1k^3.

The shared grid currently inherits the roi-mode default (t64 b16), which
pays (78/64)^3 = 1.81x halo redundancy over the whole volume.  Larger
tiles cut redundancy (t128: 1.37x, t176-overshoot: 1.39x) but
big-spatial convs measured SLOWER per input voxel at roi scale
(BENCH_NOTES round 2).  Whole-volume scale may trade differently —
measure, don't guess.

python experiments/shared_tile_sweep.py >> \
    experiments/shared_tile_sweep.jsonl
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
    from flypylib_tpu.infer.large import (
        DetectPipeline,
        detect_staged,
        make_stream_plan,
        stage_volume_chunked,
    )
    from flypylib_tpu.infer.tiled import infer_volume
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    size = 1024
    pspec, variables = _flagship()
    vol = make_volume_u8(size, n_blobs=max(64, size // 8))
    probe = infer_volume(
        pspec, variables,
        vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
    )
    thr = float(np.quantile(probe, 0.9999))
    common = dict(window=5, threshold=thr,
                  max_detections_per_roi=32768,
                  max_components_per_roi=32768, method="both")
    base = None
    import os
    variants = ((64, 16), (128, 8), (128, 16), (176, 4), (64, 32))
    pick = os.environ.get("SWEEP_VARIANTS")
    if pick:
        variants = tuple(
            tuple(int(x) for x in v.split("x"))
            for v in pick.split(",")
        )
    for t_out, t_batch in variants:
        # A fresh CONSISTENT plan per variant (round-7 fix): poking
        # plan._fp with a different tile geometry silently desynced the
        # staged buffer from the pipeline's grid-extended padded_shape
        # for non-1024-dividing tiles (t72's plan extends out_shape to
        # 1080^3; dynamic_slice clamps and the far-edge band computes on
        # wrong voxels — detections were off by -12k at t72/-4k at t96
        # while rates stayed ~honest).  make_stream_plan(tile_out=...)
        # keeps grid, staging, and pipeline geometry consistent.
        plan = make_stream_plan(pspec, variables, vol.shape, core=512,
                                tile_out=t_out, tile_batch=t_batch,
                                **common)
        staged = stage_volume_chunked(vol, plan=plan)
        np.asarray(jax.device_get(staged.chunks[-1][:1, :1, :1]))
        # warm-up: compile the full shared path on a 1-ROI grid
        grid = plan.grid
        plan.grid = grid[:1]
        det = detect_staged(pspec, variables, vol, staged=staged,
                            plan=plan, forward="shared", **common)
        plan.grid = grid
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            det = detect_staged(pspec, variables, vol, staged=staged,
                                plan=plan, forward="shared", **common)
            times.append(time.perf_counter() - t0)
        n_tiles = sum(
            local.shape[0] * local.shape[1] for _, local in
            plan._fp._slabs
        )
        rec = {
            "tile": (t_out, t_batch),
            "tin": plan._fp._tin,
            "grid_input_gvox": round(n_tiles * plan._fp._tin**3 / 1e9, 3),
            "seconds": [round(t, 3) for t in times],
            "mvox_s": round(vol.size / min(times) / 1e6, 1),
            "n_nms": len(det[0]),
            "n_cc": len(det[1]),
        }
        if base is None:
            base = (sorted(d.locs.tobytes() for d in det),)
        else:
            same = sorted(d.locs.tobytes() for d in det) == base[0]
            rec["identical_detections"] = bool(same)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
