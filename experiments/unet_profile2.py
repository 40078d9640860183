"""U-Net round-3 follow-up: larger tiles + relayout barriers.

unet_profile.jsonl showed the U-Net prefers BIG tiles (context 20:
tile-64 input redundancy (104/64)^3 = 4.3x vs 2.26x at 128) — sweep
beyond 128, and A/B the optimization_barrier variant (PackedUNet
barriers=True) that fixed the transpose-fused-into-conv defect in the
ConvStack engine.

python experiments/unet_profile2.py [size]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sys.path.insert(0, ".")
    from bench import make_volume
    from flypylib_tpu.infer.pipeline import DetectPipeline
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.packed_unet import packed_unet_spec

    spec = unet()
    tin = 128
    variables = spec.init(jax.random.PRNGKey(0), tin)
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

    open("experiments/unet_profile2.jsonl", "w").close()

    def rec(row):
        print(json.dumps(row), flush=True)
        with open("experiments/unet_profile2.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    for barriers, tile_out, tile_batch in [
        (True, 128, 2),
        (False, 192, 1),
        (True, 192, 1),
        (True, 128, 4),
    ]:
        s = packed_unet_spec(spec, barriers=barriers)
        try:
            mvox, dt = run(s, tile_out, tile_batch)
            rec({"engine": "packed", "barriers": barriers,
                 "tile_out": tile_out, "tile_batch": tile_batch,
                 "mvox_s": round(mvox, 1), "seconds": round(dt, 3)})
        except Exception as e:
            rec({"engine": "packed", "barriers": barriers,
                 "tile_out": tile_out, "tile_batch": tile_batch,
                 "error": str(e)[:120]})


if __name__ == "__main__":
    main()
