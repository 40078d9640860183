"""Probe: where does the U-Net shared forward's HBM peak land at 1k^3?

The tin-388 covering grid OOM'd (shared_fwd_ab).  This walks the shared
forward slab by slab, printing device memory stats after each dispatch
completes, and tries successively smaller grid tiles until one fits —
the measurement that sizes full_pipe's memory-aware tile cap.

python experiments/shared_unet_mem.py [max_tile_in ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def stats(tag):
    import jax

    d = jax.devices()[0]
    s = d.memory_stats() or {}
    print(json.dumps({
        "tag": tag,
        "in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 2),
        "peak_gb": round(s.get("peak_bytes_in_use", 0) / 2**30, 2),
        "limit_gb": round(s.get("bytes_limit", 0) / 2**30, 2),
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_volume_u8
    from flypylib_tpu.infer.large import (
        make_stream_plan,
        stage_volume_chunked,
    )
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.packed_unet import packed_unet_spec
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    vol = make_volume_u8(1024, n_blobs=128)
    common = dict(window=5, threshold=0.99, method="both")
    plan = make_stream_plan(pspec, variables, vol.shape, **common)
    staged = stage_volume_chunked(vol, plan=plan)
    np.asarray(jax.device_get(staged.chunks[-1][:1, :1, :1]))
    stats("staged")

    caps = [int(a) for a in sys.argv[1:]] or [428, 388, 348]
    for cap in caps:
        plan._fp = None  # rebuild the shared pipe with this cap
        from flypylib_tpu.infer.tiled import grid_tiling_min_cost
        from flypylib_tpu.infer.pipeline import DetectPipeline

        t_out, t_batch = grid_tiling_min_cost(pspec, plan.shape,
                                              max_tile_in=cap)
        fp = DetectPipeline(
            pspec, variables, vol_shape=plan.shape, tile_out=t_out,
            tile_batch=t_batch, window=plan.window,
            threshold=plan.threshold, max_detections=1, run_cc=False,
            pre_padded=True,
        )
        plan._fp = fp
        print(json.dumps({
            "cap": cap, "tile_out": fp._tiled.tile_out,
            "tin": fp._tin, "n_slabs": len(fp._slabs),
            "out_gb": round(4 * float(np.prod(fp._out_shape)) / 2**30, 2),
        }), flush=True)
        try:
            t0 = time.perf_counter()
            shell = plan.shared_prob(staged)
            shell.block_until_ready()
            np.asarray(jax.device_get(shell[:1, :1, :1]))
            dt = time.perf_counter() - t0
            stats(f"cap{cap}_shell_done")
            print(json.dumps({
                "cap": cap, "forward_plus_shell_s": round(dt, 2),
                "mvox_s_fwd_only": round(vol.size / dt / 1e6, 1),
            }), flush=True)
            del shell
            break
        except Exception as e:
            print(json.dumps({"cap": cap, "error": str(e)[:150]}),
                  flush=True)
            stats(f"cap{cap}_failed")


if __name__ == "__main__":
    main()
