"""A/B: shared whole-volume forward vs per-ROI forwards at 1k^3.

forward="roi" recomputes each ROI's NMS-halo shell ((528/512)^3 = 1.10x
redundant conv FLOPs for the conv stack at core 512) and, for the
pooled U-Net, pays covering-tile overlap per ROI (~2.5x at the
cost-aware default core).  forward="shared" forwards the whole volume
ONCE through a cost-minimal tile grid, -inf-shells the map, and runs
every ROI's postprocess as a traced window — detections proven
identical on CPU (tests/test_large.py::test_staged_shared_forward_*).
This measures both modes on the real chip, same staged upload, same
plan, detection lists compared exactly.

python experiments/shared_fwd_ab.py [convstack|unet] >> \
    experiments/shared_fwd_ab.jsonl
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run(model: str):
    import jax

    from bench import _flagship, make_volume_u8
    from flypylib_tpu.infer.large import (
        detect_staged,
        make_stream_plan,
        stage_volume_chunked,
    )
    from flypylib_tpu.infer.tiled import infer_volume

    size = 1024
    if model == "convstack":
        pspec, variables = _flagship()
        plan_kw = dict(core=512)
    else:
        from flypylib_tpu.models.zoo import unet
        from flypylib_tpu.ops.packed_unet import packed_unet_spec

        spec = unet()
        pspec = packed_unet_spec(spec) or spec
        variables = spec.init(
            jax.random.PRNGKey(0),
            pspec.valid_size(64 + 2 * pspec.context),
        )
        plan_kw = {}
    vol = make_volume_u8(size, n_blobs=max(64, size // 8))
    probe = infer_volume(
        pspec, variables,
        vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
    )
    thr = float(np.quantile(probe, 0.9999))
    common = dict(window=5, threshold=thr,
                  max_detections_per_roi=32768,
                  max_components_per_roi=32768, method="both")
    plan = make_stream_plan(pspec, variables, vol.shape, **plan_kw,
                            **common)
    staged = stage_volume_chunked(vol, plan=plan)
    np.asarray(jax.device_get(staged.chunks[-1][:1, :1, :1]))
    fp = plan.full_pipe()
    print(json.dumps({
        "model": model,
        "shared_tile": (fp._tiled.tile_out, fp._tiled.tile_batch),
        "roi_tile": (plan.pipe._tiled.tile_out, plan.pipe._tiled.tile_batch),
        "core": plan.core_dims,
        "shared_auto": plan.shared_auto(
            sum(c.nbytes for c in staged.chunks)
        ),
    }), flush=True)

    results = {}
    for mode in ("shared", "roi"):
        # warm-up/compile (shared: full forward + shell + one window;
        # roi: one ROI forward + postprocess)
        grid = plan.grid
        plan.grid = grid[:1]
        detect_staged(pspec, variables, vol, staged=staged, plan=plan,
                      forward=mode, **common)
        plan.grid = grid
        for _, corner in grid:
            staged.window(tuple(corner), plan.pipe.padded_shape)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            det = detect_staged(pspec, variables, vol, staged=staged,
                                plan=plan, forward=mode, **common)
            times.append(time.perf_counter() - t0)
        results[mode] = {
            "seconds": [round(t, 3) for t in times],
            "mvox_s": round(vol.size / min(times) / 1e6, 1),
            "n_nms": len(det[0]),
            "n_cc": len(det[1]),
            "det": det,
        }
        print(json.dumps({
            "model": model, "mode": mode,
            **{k: v for k, v in results[mode].items() if k != "det"},
        }), flush=True)

    a, b = results["shared"]["det"], results["roi"]["det"]
    same = all(
        len(x) == len(y)
        and np.array_equal(x.locs, y.locs)
        and np.array_equal(x.conf, y.conf)
        for x, y in zip(a, b)
    )
    print(json.dumps({"model": model, "identical_detections": same}),
          flush=True)


def main():
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "convstack"
    run(which)


if __name__ == "__main__":
    main()
