"""Does the U-Net monolithic-tile win scale to 256^3?

unet_pipe_tiles.py showed ONE covering tile beats grids at 192^3 (44.4
vs 36.2 Mvox/s: the packed U-Net chain rate grows with tile size and
grids pay 1.7-3x halo redundancy).  At 256^3 a covering tile means
tin 296 (~26 Mvox of f32 activations at full res) — this probes
whether it compiles/fits on a 16 GB v5e and still beats the best grid.
Grid candidate: t128b2 (8 tiles of 168^3, 2.26x redundancy — the best
non-covering ratio available under size_multiple 4).

Run order: grid first, monolithic second (a codegen crash on the risky
big shape then loses nothing).

python experiments/unet_scale256.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from bench import make_volume
from flypylib_tpu.infer.pipeline import DetectPipeline
from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_unet import packed_unet_spec
from flypylib_tpu.utils.cache import enable_compilation_cache

SIZE = 256


def main():
    enable_compilation_cache()
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    tin0 = pspec.valid_size(64 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin0)
    vol = (make_volume(SIZE, n_blobs=SIZE // 16) * 255).astype(np.uint8)
    q = 1.0 - 2000.0 / vol.size

    shapes = [(128, 2), (256, 1)]
    open("experiments/unet_scale256.jsonl", "w").close()
    for tout, tb in shapes:
        try:
            pipe = DetectPipeline(
                pspec, variables, vol.shape, tile_out=tout, tile_batch=tb,
                window=5, threshold_quantile=q,
                max_detections=4096, max_components=4096,
            )
            staged = pipe.stage_full(vol)
            res = pipe.postprocess(pipe.forward_full(staged))  # warm
            tt = []
            for _ in range(3):
                t0 = time.perf_counter()
                pipe.postprocess(pipe.forward_full(staged))
                tt.append(time.perf_counter() - t0)
            row = {
                "tile_out": tout, "tile_batch": tb,
                "tile_in": pipe._tiled.tile_in,
                "eff_tile_out": pipe._tiled.tile_out,
                "mvox_s": round(vol.size / min(tt) / 1e6, 1),
                "seconds": round(min(tt), 4),
                "n_det": len(res[0]),
            }
        except Exception as e:  # noqa: BLE001 — record OOM/codegen faults
            row = {"tile_out": tout, "tile_batch": tb,
                   "error": str(e)[:160]}
        print(json.dumps(row), flush=True)
        with open("experiments/unet_scale256.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
