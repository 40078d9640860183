"""Split the 1k^3 shared-mode U-Net sweep into forward vs postprocess,
and A/B the POSTPROCESS core size.

In shared mode the forward cost is core-independent (one whole-volume
covering-grid forward into the shell); the per-ROI postprocess sweep
scales with ROI count x per-ROI fixed cost + window-halo redundancy.
`_default_core` still optimizes the roi-mode covering-tile criterion
(ROI count x tile volume under the tin-428 cap), which caps the core at
~256 -> 64 ROIs at 1k^3.  Larger cores are legal for the postprocess
windows (the ConvStack already postprocesses 528^3 ROI windows) — only
roi-mode FORWARDS hit the 428 compile cap, and shared mode never runs
them.

python experiments/unet_shared_core.py [cores...]
"""

from __future__ import annotations

import json
import sys
import time

import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_volume_u8  # noqa: E402
from flypylib_tpu.infer.large import (
    detect_staged,
    make_stream_plan,
    stage_volume_chunked,
)
from flypylib_tpu.infer.tiled import infer_volume
from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_unet import packed_unet_spec
from flypylib_tpu.utils.cache import enable_compilation_cache


def main():
    cores = [int(c) for c in sys.argv[1:]] or [0, 512]
    enable_compilation_cache()
    size = 1024
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    vol = make_volume_u8(size, n_blobs=max(64, size // 8))
    probe = infer_volume(
        pspec, variables,
        vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
    )
    thr = float(np.quantile(probe, 0.9999))
    common = dict(window=5, threshold=thr, max_detections_per_roi=32768,
                  max_components_per_roi=32768, method="both")

    open("experiments/unet_shared_core.jsonl", "a").close()
    for core in cores:
        plan = make_stream_plan(
            pspec, variables, vol.shape,
            core=(core or None), **common,
        )
        staged = stage_volume_chunked(vol, plan=plan)
        np.asarray(jax.device_get(staged.chunks[-1][:1, :1, :1]))

        # warm both phases once
        shell = plan.shared_prob(staged)
        np.asarray(jax.device_get(shell[:1, :1, :1]))
        nms0, cc0 = plan.consume_shared(shell)
        del shell

        t_fwd, t_post, t_tot = [], [], []
        for _ in range(2):
            t0 = time.perf_counter()
            shell = plan.shared_prob(staged)
            np.asarray(jax.device_get(shell[:1, :1, :1]))
            t1 = time.perf_counter()
            nms_det, cc_det = plan.consume_shared(shell)
            t2 = time.perf_counter()
            del shell
            t_fwd.append(t1 - t0)
            t_post.append(t2 - t1)
            t_tot.append(t2 - t0)
        dt = min(t_tot)
        row = {
            "core": core or "default",
            "n_rois": len(plan.grid),
            "fwd_s": round(min(t_fwd), 2),
            "post_s": round(min(t_post), 2),
            "total_s": round(dt, 2),
            "mvox_s": round(vol.size / dt / 1e6, 1),
            "detections": len(nms_det),
            "components": len(cc_det),
        }
        print(json.dumps(row), flush=True)
        with open("experiments/unet_shared_core.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")
        del staged, plan


if __name__ == "__main__":
    main()
