"""Real-pipeline U-Net tile A/B at the bench shape (config 4, 192^3).

unet_tile_chain.py showed the bare packed-U-Net chain rate GROWS with
tile size (64 -> 82 tile-Mvox/s from tin 140 to tin 236 in a contended
session, no codegen crash up to tin 236/B1), and at 192^3 the monolithic
tout=196 tile carries only 1.86x processed-voxel redundancy vs 3.10x
for the t100 grid.  But the bare-chain harness hoists weights as
constants (the round-2 "free layouts" artifact), so this measures the
REAL DetectPipeline (stage_full + forward_full + postprocess, exactly
bench_unet's loop) across tile shapes, plus a forward-only split.

python experiments/unet_pipe_tiles.py
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

SIZE = 192


def main():
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    tin0 = pspec.valid_size(64 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin0)
    vol = (make_volume(SIZE, n_blobs=SIZE // 16) * 255).astype(np.uint8)
    q = 1.0 - 2000.0 / vol.size

    # NOTE: (96, 1) reproducibly CRASHES the TPU worker (codegen fault,
    # like the known-bad t96b4) — excluded.  (96, 2) is the production
    # shape and the comparison reference.
    shapes = [(96, 2), (180, 1), (196, 1)]
    open("experiments/unet_pipe_tiles.jsonl", "w").close()
    ref = None
    for tout, tb in shapes:
        try:
            pipe = DetectPipeline(
                pspec, variables, vol.shape, tile_out=tout, tile_batch=tb,
                window=5, threshold_quantile=q,
                max_detections=4096, max_components=4096,
            )
            staged = pipe.stage_full(vol)
            res = pipe.postprocess(pipe.forward_full(staged))  # warm
            n_det = len(res[0])
            ok = ref is None or n_det == ref
            if ref is None:
                ref = n_det
            tf, tt = [], []
            for _ in range(3):
                t0 = time.perf_counter()
                out = pipe.forward_full(staged)
                np.asarray(out[0, 0, 0]) if hasattr(out, "shape") else None
                t1 = time.perf_counter()
                pipe.postprocess(out)
                tt.append(time.perf_counter() - t0)
                tf.append(t1 - t0)
            row = {
                "tile_out": tout, "tile_batch": tb,
                "tile_in": pipe._tiled.tile_in,
                "eff_tile_out": pipe._tiled.tile_out,
                "total_mvox_s": round(vol.size / min(tt) / 1e6, 1),
                "fwd_seconds": round(min(tf), 4),
                "total_seconds": round(min(tt), 4),
                "n_det": n_det, "det_matches": ok,
            }
        except Exception as e:  # noqa: BLE001 — record codegen faults
            row = {"tile_out": tout, "tile_batch": tb,
                   "error": str(e)[:140]}
        print(json.dumps(row), flush=True)
        with open("experiments/unet_pipe_tiles.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")
        if "error" in row:
            break


if __name__ == "__main__":
    main()
