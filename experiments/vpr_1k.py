"""1k^3 voxel PR via voxel_pr_streaming on the real TPU (eval config 4's
on-device PR evaluation at north-star scale): bounded-memory z-slab
sweep, uint8 gray + labels on the wire, only integer counts to host.

python experiments/vpr_1k.py >> experiments/vpr_1k.jsonl
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from bench import _flagship, make_volume_u8
    from flypylib_tpu.ops.matching import voxel_pr_streaming
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    size = 1024
    pspec, variables = _flagship()
    gray = make_volume_u8(size, n_blobs=size // 8)
    rng = np.random.default_rng(1)
    labels = (rng.random((size,) * 3) > 0.999).astype(np.uint8)

    # warm-up on a 2-slab prefix volume to compile engine + counts
    t0 = time.perf_counter()
    voxel_pr_streaming(pspec, variables, gray[:128], labels[:128],
                       slab=64)
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = voxel_pr_streaming(pspec, variables, gray, labels, slab=64)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "size": size,
        "warmup_s": round(warm, 1),
        "seconds": round(dt, 2),
        "mvox_s": round(size**3 / dt / 1e6, 1),
        "n_thresholds": len(out["thresholds"]),
        "recall_at_0.5": round(float(out["recall"][9]), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
