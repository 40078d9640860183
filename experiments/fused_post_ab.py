"""A/B: fused vs two-dispatch sparse postprocess on the REAL 1k^3 bench.

The fused postprocess moved the bench detection counts by +3
(118631/120653 vs BENCH_r02's 118628/120650).  CPU tests pin the fused
path bit-exact vs the host scipy reference, so the shift should come
from the two-phase FORWARD (round-3 commit 5b81772: separate XLA
executables round bf16/f32 borderline voxels differently than round 2's
single-dispatch forward), not from the postprocess.  This proves it on
hardware: same staged volume, same plan geometry, fused vs unfused
postprocess, detection lists compared exactly.

python experiments/fused_post_ab.py
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
        detect_staged,
        make_stream_plan,
        stage_volume,
    )
    from flypylib_tpu.infer.tiled import infer_volume

    pspec, variables = _flagship()
    size = 1024
    vol = make_volume_u8(size, n_blobs=max(64, size // 8))
    probe = infer_volume(
        pspec, variables,
        vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
    )
    thr = float(np.quantile(probe, 0.9999))
    common = dict(window=5, threshold=thr,
                  max_detections_per_roi=32768,
                  max_components_per_roi=32768, method="both")
    plan = make_stream_plan(pspec, variables, vol.shape, core=512,
                            **common)
    staged = stage_volume(vol, plan=plan)

    results = {}
    for mode in ("fused", "unfused"):
        plan.fuse_sparse = mode == "fused"
        # warm-up/compile on one ROI
        grid = plan.grid
        plan.grid = grid[:1]
        detect_staged(pspec, variables, vol, staged=staged, plan=plan,
                      **common)
        plan.grid = grid
        t0 = time.perf_counter()
        nms_det, cc_det = detect_staged(
            pspec, variables, vol, staged=staged, plan=plan, **common
        )
        dt = time.perf_counter() - t0
        results[mode] = (nms_det, cc_det)
        print(json.dumps({
            "mode": mode, "seconds": round(dt, 3),
            "mvox_s": round(vol.size / dt / 1e6, 1),
            "nms": len(nms_det), "cc": len(cc_det),
        }), flush=True)

    (nf, cf), (nu, cu) = results["fused"], results["unfused"]
    np.testing.assert_array_equal(nf.locs, nu.locs)
    np.testing.assert_array_equal(nf.conf, nu.conf)
    np.testing.assert_array_equal(cf.locs, cu.locs)
    np.testing.assert_allclose(cf.conf, cu.conf, rtol=0, atol=0)
    print("fused == unfused on TPU: OK (the +3 predates the fused "
          "postprocess — it is the two-phase forward's rounding)",
          flush=True)


if __name__ == "__main__":
    main()
