"""Time split between phase A (pack + stage-A convs + parity split) and
phase B (stage-B convs + head + stitch) of the two-phase slab forward at
the t64b16 shared-grid operating point.

Decides whether supertile stage-A sharing (compute stage A once per
2x2x2 tile group, slice per-tile stage-B windows from it) is worth
building: the win is bounded by 0.22 x (phase-A share) minus the slice
cost.

python experiments/phase_split.py >> experiments/phase_split.jsonl
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def force(x):
    """Timing barrier that works through the tunnel (CLAUDE.md)."""
    import jax

    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _flagship
    from flypylib_tpu.infer.large import DetectPipeline
    from flypylib_tpu.infer.pipeline import _zoff
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    size = 512
    fp = DetectPipeline(
        pspec, variables, vol_shape=(size,) * 3,
        tile_out=64, tile_batch=16, window=5, threshold=0.5,
        max_detections=1, run_cc=False, pre_padded=True,
    )
    assert fp.two_phase
    pz, py, px = fp.padded_shape
    big = jnp.zeros((pz, py, px), jnp.uint8)
    origin = jnp.zeros((3,), jnp.int32)
    out0 = jnp.zeros(fp._out_shape, jnp.float32)

    def run(mode: str):
        out = out0 + 0  # fresh donatable buffer
        last_xa = None
        for zs, local in fp._slabs:
            for lc in fp._phase_a_chunks(local):
                xa = fp._slab_phase_a(
                    variables, big, origin, jnp.int32(zs), lc
                )
                if mode == "ab":
                    out = fp._slab_phase_b(
                        variables, xa, out, lc, _zoff(zs)
                    )
                else:
                    last_xa = xa
        if mode == "ab":
            force(out)
        else:
            force(jax.tree.leaves(last_xa)[0])

    print(json.dumps({"built": True, "tin": fp._tin,
                      "n_slabs": len(fp._slabs)}), flush=True)
    for mode in ("ab", "a"):
        t0 = time.perf_counter()
        run(mode)  # warm-up/compile
        print(json.dumps({"mode": mode, "warmup_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(mode)
            times.append(time.perf_counter() - t0)
        n_tiles = sum(
            local.shape[0] * local.shape[1] for _, local in fp._slabs
        )
        print(json.dumps({
            "mode": mode,
            "size": size,
            "tin": fp._tin,
            "n_tiles": n_tiles,
            "seconds": [round(t, 4) for t in times],
            "best": round(min(times), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
