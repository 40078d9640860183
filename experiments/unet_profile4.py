"""U-Net tile micro-sweep around the t96b2 optimum (round 3, cont.).

t96b2 = 36.2 Mvox/s at 192^3 won the profile3 sweep; untried neighbors
(t80b2, t88b2, t104b2) and the ragged t96b3 might close the remaining
gap to the 40 Mvox/s config-4 target.  NB t96b4 reproducibly CRASHES
the TPU worker (Mosaic/XLA codegen fault) — excluded.

python experiments/unet_profile4.py [size]
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

    open("experiments/unet_profile4.jsonl", "w").close()

    def rec(row):
        print(json.dumps(row), flush=True)
        with open("experiments/unet_profile4.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    # NB (80, 4) LAST: batch-4 U-Net shapes are near the known
    # t96b4 worker-crash regime; if it faults, the rest is already done.
    for tile_out, tile_batch in [(96, 2), (80, 2), (88, 2), (104, 2),
                                 (96, 3), (80, 4)]:
        row = {"tile_out": tile_out, "tile_batch": tile_batch}
        try:
            pipe = DetectPipeline(
                pspec, variables, vol.shape, tile_out=tile_out,
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
            row.update(seconds=round(min(times), 4),
                       mvox_s=round(vol.size / min(times) / 1e6, 1))
        except Exception as e:  # noqa: BLE001 — record and continue
            row["error"] = str(e)[:200]
        rec(row)


if __name__ == "__main__":
    main()
