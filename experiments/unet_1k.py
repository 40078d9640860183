"""U-Net (eval config 4) at the 1k^3 north-star scale.

detect_staged with the packed U-Net through the new pooled defaults:
core 256 (cost-optimal 4^3 ROI grid), ONE covering 348-tile per ROI,
phase-aligned halos (the round-3 pooling-phase fix).  Reports the
chip-bound sweep rate and the end-to-end (upload + sweep) rate.

python experiments/unet_1k.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from bench import make_volume_u8
from flypylib_tpu.infer.large import (
    detect_staged,
    make_stream_plan,
    stage_volume_chunked,
)
from flypylib_tpu.infer.tiled import infer_volume
from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_unet import packed_unet_spec
from flypylib_tpu.utils.cache import enable_compilation_cache

SIZE = 1024


def main():
    enable_compilation_cache()
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    vol = make_volume_u8(SIZE, n_blobs=SIZE // 8)

    probe = infer_volume(
        pspec, variables,
        vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
    )
    thr = float(np.quantile(probe, 0.9999))
    common = dict(window=5, threshold=thr, max_detections_per_roi=32768,
                  max_components_per_roi=32768, method="both")
    plan = make_stream_plan(pspec, variables, vol.shape, **common)
    print(json.dumps({
        "core": plan.core, "core_dims": plan.core_dims, "h": plan.h,
        "tile_in": plan.pipe._tiled.tile_in,
        "rois": len(plan.grid),
    }), flush=True)

    t0 = time.perf_counter()
    staged = stage_volume_chunked(vol, plan=plan)
    np.asarray(jax.device_get(staged.chunks[-1][:1, :1, :1]))
    t_up = time.perf_counter() - t0

    grid = plan.grid
    plan.grid = grid[:1]
    detect_staged(pspec, variables, vol, staged=staged, plan=plan, **common)
    plan.grid = grid
    for _, corner in grid:
        staged.window(tuple(corner), plan.pipe.padded_shape)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        nms_det, cc_det = detect_staged(pspec, variables, vol,
                                        staged=staged, plan=plan, **common)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "unet_1k_device_resident_mvox_s": round(vol.size / dt / 1e6, 1),
        "unet_1k_mvox_s": round(vol.size / (t_up + dt) / 1e6, 1),
        "upload_seconds": round(t_up, 2),
        "sweep_seconds": [round(t, 3) for t in times],
        "nms": len(nms_det), "cc": len(cc_det),
    }), flush=True)


if __name__ == "__main__":
    main()
