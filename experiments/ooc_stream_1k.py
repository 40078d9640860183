"""Out-of-core streamed 1k^3 detection: forward="roi" vs "auto"/shared.

The eval-config-5 engine (detect_streaming) on the real TPU: the volume
lives in host RAM only (array_reader), every byte crosses the tunnel.
roi mode re-reads overlapping halo windows (~(core+2fh)^3/core^3 wire
redundancy) and re-forwards covering-tile overlap; shared mode reads
each z-band once and forwards once.  Records wall-clock + detections
per mode to experiments/ooc_stream_1k.jsonl.

Usage: python experiments/ooc_stream_1k.py [--model conv|unet] [--size 1024]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import make_volume_u8  # noqa: E402
from flypylib_tpu.infer.large import (  # noqa: E402
    array_reader,
    detect_streaming,
    make_stream_plan,
)
from flypylib_tpu.infer.tiled import infer_volume  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--model", default="conv", choices=["conv", "unet"])
p.add_argument("--size", type=int, default=1024)
p.add_argument("--core", type=int, default=None)
args = p.parse_args()

if args.model == "conv":
    from bench import _flagship

    pspec, variables = _flagship()
    core = args.core or 512
else:
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.packed_unet import packed_unet_spec

    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    core = args.core  # default: cost-aware pooled core

vol = make_volume_u8(args.size, n_blobs=max(64, args.size // 8))
probe = infer_volume(
    pspec, variables,
    vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
)
thr = float(np.quantile(probe, 0.9999))
common = dict(window=5, threshold=thr, max_detections_per_roi=32768,
              max_components_per_roi=32768, method="both")
shape, read = array_reader(vol)
plan = make_stream_plan(pspec, variables, shape, core=core, **common)
rpb = plan.band_rpb(itemsize=1)
print(f"model={args.model} size={args.size} core={plan.core_dims} "
      f"grid={len(plan.grid)} band_rpb={rpb}", flush=True)

out = {"model": args.model, "size": args.size, "core": plan.core_dims,
       "band_rpb": rpb, "threshold": thr}
for mode in ("shared", "roi"):
    if mode == "shared" and rpb is None:
        print("shared does not fit; skipping", flush=True)
        continue
    # warm: shared-band executables are band-shaped, so the only true
    # warm-up is a full pass (persistent cache makes it cheap across
    # sessions); roi warms with a one-ROI grid
    if mode == "shared":
        detect_streaming(pspec, variables, shape, read, plan=plan,
                         forward=mode, **common)
    else:
        grid = plan.grid
        plan.grid = grid[:1]
        try:
            detect_streaming(pspec, variables, shape, read, plan=plan,
                             forward=mode, **common)
        finally:
            plan.grid = grid
    t0 = time.perf_counter()
    nms_det, cc_det = detect_streaming(pspec, variables, shape, read,
                                       plan=plan, forward=mode, **common)
    dt = time.perf_counter() - t0
    out[f"{mode}_seconds"] = round(dt, 2)
    out[f"{mode}_mvox_s"] = round(vol.size / dt / 1e6, 1)
    out[f"{mode}_nms"] = len(nms_det)
    out[f"{mode}_cc"] = len(cc_det)
    print(f"{mode}: {dt:.1f}s = {vol.size / dt / 1e6:.1f} Mvox/s "
          f"({len(nms_det)} nms, {len(cc_det)} cc)", flush=True)

if "roi_nms" in out and "shared_nms" in out:
    assert out["roi_nms"] == out["shared_nms"]
    assert out["roi_cc"] == out["shared_cc"]
with open("experiments/ooc_stream_1k.jsonl", "a") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out))
