"""Anisotropic tile shapes for the packed conv-stack chain (round 5).

t64b16 pays (76/64)^3 = 1.67x halo redundancy; every CUBIC tile that
cuts it collapses on big-spatial convs (shared_tile_sweep: t128 runs at
half rate).  The collapse evidence so far implicates the y/x (minor,
lane-tiled) dims — stagea_super saw it at 70^2 packed y/x with z held
small.  If the chain holds its per-INPUT-voxel rate with z elongated
and y/x kept at 64, the z-halo redundancy term (76/64 = 1.19x) shrinks
toward 1 at equal memory: t(256,64,64)b4 needs 1.585 Gvox of conv input
for 1k^3 vs t64b16's 1.798 (-11.9%).

Times the production two-phase protocol (phase A / phase B as separate
async dispatches, lag-1 pipelined like DetectPipeline's slab loop).

python experiments/aniso_tile.py >> experiments/aniso_tile.jsonl
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from bench import _flagship
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    mod = pspec.module
    halo = 2 * pspec.context  # tin = tout + halo per axis

    fa = jax.jit(mod.apply_stage_a)
    fb = jax.jit(mod.apply_stage_b)

    def force(x):
        return np.asarray(jax.device_get(x[(0,) * x.ndim]))

    # (tout_z, tout_y, tout_x, batch) at ~equal total output voxels
    shapes = [
        (64, 64, 64, 16),   # production baseline
        (128, 64, 64, 8),   # z-elongated
        (64, 128, 64, 8),   # y-elongated (which axis collapses?)
        (64, 64, 128, 8),   # x-elongated
        (256, 64, 64, 4),
        (512, 64, 64, 2),
    ]
    key = jax.random.PRNGKey(0)
    for tz, ty, tx, b in shapes:
        tin = (tz + halo, ty + halo, tx + halo)
        x = jax.random.uniform(
            key, (b, *tin, 1), jnp.bfloat16, 0.0, 1.0
        )
        try:
            t0 = time.perf_counter()
            out = fb(variables, fa(variables, x))
            force(out)
            warm = time.perf_counter() - t0
            iters = 20
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                o = None
                for _ in range(iters):
                    o = fb(variables, fa(variables, x))
                force(o)
                best = min(best, (time.perf_counter() - t0) / iters)
            out_mvox = b * tz * ty * tx / 1e6
            in_mvox = b * tin[0] * tin[1] * tin[2] / 1e6
            print(json.dumps({
                "tout": [tz, ty, tx], "batch": b,
                "ms": round(best * 1e3, 2),
                "out_mvox_s": round(out_mvox / best, 1),
                "in_mvox_s": round(in_mvox / best, 1),
                "warmup_s": round(warm, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(json.dumps({
                "tout": [tz, ty, tx], "batch": b,
                "error": str(e)[:120],
            }), flush=True)


if __name__ == "__main__":
    main()
