"""U-Net sweep continuation after the pool_pack fix (192^3 volume).

With pool+repack now strided-slice (near-free), small tiles jumped:
(48, b8) = 32.6 Mvox/s vs 17.9 pre-fix best.  The worker crashed before
(96, 4)/(128, 2)/plain ran; this retries those plus duplicate-free batch
configs (a padded tile batch wastes whole-tile compute: t64b8 on 192^3
pads 27 -> 32 tiles = 18% waste).

python experiments/unet_profile3.py [size]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    sys.path.insert(0, ".")
    from bench import make_volume
    from flypylib_tpu.infer.pipeline import DetectPipeline
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.packed_unet import packed_unet_spec

    spec = unet()
    pspec = packed_unet_spec(spec)
    variables = spec.init(jax.random.PRNGKey(0), 128)
    vol = (make_volume(size, n_blobs=max(8, size // 16)) * 255).astype(
        np.uint8
    )
    q = 1.0 - 2000.0 / vol.size

    def run(s, tile_out, tile_batch):
        pipe = DetectPipeline(
            s, variables, vol.shape, tile_out=tile_out,
            tile_batch=tile_batch, window=5, threshold_quantile=q,
            max_detections=4096, max_components=4096,
        )
        staged = pipe.stage_full(vol)
        pipe.postprocess(pipe.forward_full(staged))  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            pipe.postprocess(pipe.forward_full(staged))
            times.append(time.perf_counter() - t0)
        return vol.size / min(times) / 1e6, min(times)

    open("experiments/unet_profile3.jsonl", "w").close()

    def rec(row):
        print(json.dumps(row), flush=True)
        with open("experiments/unet_profile3.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    for engine, tile_out, tile_batch in [
        ("packed", 48, 16),
        ("packed", 96, 2),
        ("packed", 96, 4),
        ("packed", 128, 2),
        ("plain", 48, 8),
    ]:
        s = pspec if engine == "packed" else spec
        try:
            mvox, dt = run(s, tile_out, tile_batch)
            rec({"engine": engine, "tile_out": tile_out,
                 "tile_batch": tile_batch, "mvox_s": round(mvox, 1),
                 "seconds": round(dt, 3)})
        except Exception as e:
            rec({"engine": engine, "tile_out": tile_out,
                 "tile_batch": tile_batch, "error": str(e)[:120]})


if __name__ == "__main__":
    main()
