"""Standalone A/B of the U-Net decoder fold convs at the EXACT tin-388
shapes (round 6).

unet_prefix2 attributes dec0_fold (176^3, 240ch -> 192ch) 74.7 ms =
52.9 TF/s while dec0's second conv (175^3, 192 -> 192) runs ~139 TF/s
at the SAME spatial extent — so the "big-spatial collapse" story is
wrong for this stage: the outlier is the 240-channel CONCAT input
(240 = 1.875 x 128 lanes).  Variants, all timed standalone with a
consumer sum (fresh jit each; smallest risk first):

  ref192   conv (176^3,192)@(2^3,192,192)   fast-shape anchor
  prod240  conv (176^3,240)@(2^3,240,192)   the production fold shape
  pad256   conv (176^3,256)@(2^3,256,192)   contraction zero-padded to
           2x128 lanes (+6.7% trivial FLOPs) — if the 240-lane pad is
           the problem this should run at ref192's rate
  split    conv(sc192) + conv(up48)         concat deleted (round-3
           rejection was at t96 b2 — re-measured at the real shape)
  enc0c1   conv (194^3,192)@(2^3,192,192)   the single biggest conv
  dec1_480 conv (90^3,480)@(2^3,480,384)    dec1 fold shape (3.75x128)
  dec1_512 conv (90^3,512)@(2^3,512,384)    padded to 4x128

TF/s are dense-equivalent (true useful FLOPs / wall; pad variants use
the UNPADDED FLOPs so rates are directly comparable).

python experiments/dec0_probe.py
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

from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "experiments/dec0_probe.jsonl"


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


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    open(OUT, "w").close()

    def emit(row):
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(row) + "\n")

    def run(name, fn, arrs, flops):
        try:
            dtm = timeit(fn, arrs)
        except Exception as e:  # noqa: BLE001 — record codegen faults
            emit({"variant": name, "error": str(e)[:160]})
            return
        emit({
            "variant": name,
            "ms": round(dtm * 1e3, 2),
            "tf_s": round(flops / dtm / 1e12, 1),
        })

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dt)

    D = 176
    M3 = (D - 1) ** 3  # output voxels

    # --- dec0 family -----------------------------------------------------
    fl_dec0 = M3 * 8 * 240 * 192 * 2

    x192 = mk((1, D, D, D, 192))
    w192 = mk((2, 2, 2, 192, 192))
    run("ref192", lambda x, w: conv(x, w), (x192, w192), M3 * 8 * 192 * 192 * 2)
    del x192

    x240 = mk((1, D, D, D, 240))
    w240 = mk((2, 2, 2, 240, 192))
    run("prod240", lambda x, w: conv(x, w), (x240, w240), fl_dec0)

    w256 = jnp.zeros((2, 2, 2, 256, 192), dt).at[:, :, :, :240].set(w240)

    def pad256(x, w):
        xp = jnp.pad(x, ((0, 0),) * 4 + ((0, 16),))
        return conv(xp, w)

    run("pad256", pad256, (x240, w256), fl_dec0)

    # split: production fold input is concat(sc 192ch, up 48ch)
    sc = mk((1, D, D, D, 192))
    up = mk((1, D, D, D, 48))
    wsk = w240[:, :, :, :192]
    wup = w240[:, :, :, 192:]

    def split(sc, up, wsk, wup):
        return conv(sc, wsk) + conv(up, wup)

    run("split", split, (sc, up, wsk, wup), fl_dec0)
    del sc, up, x240

    # --- the biggest conv: enc0's second ---------------------------------
    E = 194
    xe = mk((1, E - 1, E - 1, E - 1, 192))
    run("enc0c1", lambda x, w: conv(x, w), (xe, w192),
        (E - 2) ** 3 * 8 * 192 * 192 * 2)
    del xe

    # --- dec1 fold (480 = 3.75 x 128) ------------------------------------
    G = 90
    fl_dec1 = (G - 1) ** 3 * 8 * 480 * 384 * 2
    xg = mk((1, G, G, G, 480))
    wg = mk((2, 2, 2, 480, 384))
    run("dec1_480", lambda x, w: conv(x, w), (xg, wg), fl_dec1)

    wg512 = jnp.zeros((2, 2, 2, 512, 384), dt).at[:, :, :, :480].set(wg)

    def pad512(x, w):
        xp = jnp.pad(x, ((0, 0),) * 4 + ((0, 32),))
        return conv(xp, w)

    run("dec1_512", pad512, (xg, wg512), fl_dec1)


if __name__ == "__main__":
    main()
