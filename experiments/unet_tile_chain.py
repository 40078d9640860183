"""Chain-rate vs tile size for the packed U-Net forward (round 3).

unet_fold_split.py showed the bare chain runs 115.5 tile-Mvox/s at
tin=140 (tout=100) — the tiled-engine 36.2 volume-Mvox/s is mostly the
(140/100)^3 = 2.74x halo redundancy.  If the chain rate survives at
bigger tiles, the redundancy drops to ~1.8-1.9x and config 4 clears 40.
Earlier TILED-engine sweeps (unet_profile3.jsonl) measured t112/t128
collapsing (26/20 Mvox/s) — this isolates whether that was the chain or
the engine, and maps the usable tile range.

Each shape is timed standalone (fresh jit); volume-rate estimate =
tile_rate / redundancy.  Runs smallest-first so a codegen crash on a
big shape keeps the useful rows.

python experiments/unet_tile_chain.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_unet import packed_unet_spec


def timeit(fn, args, iters=8, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype)
            out = fn(first, *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many(args, n=1))
    float(many(args, n=iters))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(args, n=1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(many(args, n=iters))
        tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / (iters - 1))
    return best


def main():
    rng = np.random.default_rng(0)
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm = pspec.module
    ctx = pspec.context
    variables = spec.init(jax.random.PRNGKey(0), pspec.min_size)

    def fwd(tiles):
        x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
        return pm._forward(variables, x)

    shapes = [(140, 2), (164, 2), (180, 1), (204, 1), (220, 1), (236, 1)]
    open("experiments/unet_tile_chain.jsonl", "w").close()
    for tin, B in shapes:
        tout = tin - 2 * ctx
        red = (tin / tout) ** 3
        tiles = jnp.asarray(
            rng.integers(0, 255, (B, tin, tin, tin)), jnp.uint8
        )
        try:
            dtm = timeit(fwd, (tiles,))
        except Exception as e:  # noqa: BLE001 — record codegen faults
            row = {"tin": tin, "tout": tout, "B": B,
                   "error": str(e)[:120]}
            print(json.dumps(row), flush=True)
            with open("experiments/unet_tile_chain.jsonl", "a") as fh:
                fh.write(json.dumps(row) + "\n")
            break
        out_vox = B * tout ** 3
        rate = out_vox / dtm / 1e6
        row = {"tin": tin, "tout": tout, "B": B,
               "ms": round(dtm * 1e3, 2),
               "tile_mvox_s": round(rate, 1),
               "redundancy": round(red, 2),
               "est_volume_mvox_s": round(rate / red, 1)}
        print(json.dumps(row), flush=True)
        with open("experiments/unet_tile_chain.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
