"""Out-of-core streamed U-Net at 1k^3 (detect_streaming, forward=auto).

The true streaming mode (volume read from host in band windows, band
shells on device) is the production path for volumes that don't fit
HBM.  Round 3 measured it at 41.0 Mvox/s chip-bound; this re-measures
after the round-5 fixes (pool_pack, block-diag logits, lagged-token
forward throttle, coarsened shared postprocess — the band sweep now
coarsens y/x within each band).

Chip-bound timing: the read_fn serves from a pinned host array, so the
measured rate includes host->device band transfers (the out-of-core
mode's real cost) but no disk.

python experiments/unet_stream_1k.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_volume_u8  # noqa: E402
from flypylib_tpu.infer.large import detect_streaming, make_stream_plan
from flypylib_tpu.infer.tiled import infer_volume
from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_unet import packed_unet_spec
from flypylib_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    size = 1024
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    vol = make_volume_u8(size, n_blobs=max(64, size // 8))
    probe = infer_volume(
        pspec, variables,
        vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
    )
    thr = float(np.quantile(probe, 0.9999))
    common = dict(window=5, threshold=thr, max_detections_per_roi=32768,
                  max_components_per_roi=32768, method="both")
    plan = make_stream_plan(pspec, variables, vol.shape, **common)

    def read_fn(lo, hi):
        return vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]

    # warm (compiles band pipes + postprocess variants)
    nms0, cc0 = detect_streaming(
        pspec, variables, vol.shape, read_fn, plan=plan, **common
    )
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        nms_det, cc_det = detect_streaming(
            pspec, variables, vol.shape, read_fn, plan=plan, **common
        )
        times.append(time.perf_counter() - t0)
    dt = min(times)
    row = {
        "streamed_unet_1k_s": round(dt, 2),
        "streamed_unet_1k_mvox_s": round(vol.size / dt / 1e6, 1),
        "detections": len(nms_det),
        "components": len(cc_det),
    }
    print(json.dumps(row), flush=True)
    with open("experiments/unet_stream_1k.jsonl", "a") as fh:
        fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
