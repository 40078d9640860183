"""U-Net device-resident throughput sweep (eval config 4 [B:10]).

Measures whole-volume predict+NMS+CC Mvox/s through the packed U-Net
engine (fused decoder: folded ConvTranspose + packed-domain skip crops)
across tile shapes, plus the plain (unpacked) engine at the best tile as
the A/B reference.  Round-2 state to beat: 13.2 Mvox/s device-resident at
128^3 (BENCH_NOTES.md round 2).

python experiments/unet_profile.py [size]
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
    pspec = packed_unet_spec(spec)
    tin = pspec.valid_size(64 + 2 * pspec.context)
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

    rows = []
    for tile_out, tile_batch in [
        (32, 16), (48, 8), (64, 8), (64, 16), (96, 4), (128, 2),
    ]:
        try:
            mvox, dt = run(pspec, tile_out, tile_batch)
        except Exception as e:
            rows.append({"engine": "packed", "tile_out": tile_out,
                         "tile_batch": tile_batch, "error": str(e)[:120]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        rows.append({
            "engine": "packed", "tile_out": tile_out,
            "tile_batch": tile_batch, "mvox_s": round(mvox, 1),
            "seconds": round(dt, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    best = max(
        (r for r in rows if "mvox_s" in r), key=lambda r: r["mvox_s"]
    )
    try:
        mvox, dt = run(spec, best["tile_out"], best["tile_batch"])
        rows.append({
            "engine": "plain", "tile_out": best["tile_out"],
            "tile_batch": best["tile_batch"], "mvox_s": round(mvox, 1),
            "seconds": round(dt, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    except Exception as e:
        print(json.dumps({"engine": "plain", "error": str(e)[:120]}),
              flush=True)

    with open("experiments/unet_profile.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
