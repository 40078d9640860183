"""Batched-block re-tiling of the U-Net level-0 stages (round 6).

dec0_probe showed the (176^3, 240->192) fold conv is fine standalone
(83.9 TF/s) but EVERY monolithic big-spatial conv runs ~78-84 TF/s
while the conv stack's batched 36^3 x b128 stage-B convs hit 141-156
(BENCH_NOTES round 2).  The U-Net's level-0 stages (enc0 head, dec0
tail + logits) are 11.4 of the 19.4 TF at tin 388 and all run at
176-194^3 b1.  Intra-chain re-tiling needs only the STAGE's own halo
(2 cells for two 2^3 convs), not the whole-net context-20:

  dec0_mono  (1,176^3,240) -> fold conv -> relu -> conv 192 -> relu
             -> logits dot (split bf16, 16ch) -> sum     [prod form]
  dec0_b58   same math on (27, 60^3, 240) blocks (out 58^3 tiles the
             174^3 logits output exactly; input overlap 2 cells,
             1.10x FLOP redundancy)
  dec0_b29   (216, 31^3, 240) blocks (out 29^3 x 6^3; 1.22x)
  enc0_mono  (1,194^3,8) -> conv 8->192 -> relu -> conv 192->192
  enc0_b64   (27, 66^3, 8) blocks (out 64^3 tiles 192^3; 1.06x)
  enc0_b48   (64, 50^3, 8) blocks (out 48^3 x 4^3; 1.13x)

All variants produce the same useful output voxels — compare ms
directly.  Slicing/assembly of blocks is NOT timed here (a phase-split
dispatch boundary would do it; this isolates the conv-rate question).

python experiments/dec0_retile.py
"""

from __future__ import annotations

import functools
import gc
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

OUT = "experiments/dec0_retile.jsonl"


def timeit(fn, args, iters=16, reps=3):
    # ONE compiled executable (the remote compile service runs minutes
    # per fresh executable through the tunnel — two compiles per variant
    # made the original form time out).  Per-iter time includes the
    # ~28 ms dispatch roundtrip amortized over `iters` (~2 ms bias at
    # n=16 — irrelevant for the ~80-vs-140 TF/s question probed here).
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype)
            out = fn(first, *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many(args, n=iters))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(args, n=iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")


def run(name, fn, arrs, useful_flops):
    try:
        dtm = timeit(fn, arrs)
    except Exception as e:  # noqa: BLE001 — record codegen faults
        emit({"variant": name, "error": str(e)[:160]})
        return
    emit({
        "variant": name,
        "ms": round(dtm * 1e3, 2),
        "useful_tf_s": round(useful_flops / dtm / 1e12, 1),
    })


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    if only is None:
        open(OUT, "w").close()

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dt)

    w_fold = mk((2, 2, 2, 240, 192))
    w_c1 = mk((2, 2, 2, 192, 192))
    w_log = mk((192, 16))

    def dec0_tail(x):
        y = jax.nn.relu(conv(x, w_fold))
        y = jax.nn.relu(conv(y, w_c1))
        return lax.dot_general(
            y, w_log, (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # useful FLOPs: the mono chain's (block forms repeat halo work)
    fl = (
        175**3 * 8 * 240 * 192 * 2
        + 174**3 * 8 * 192 * 192 * 2
        + 174**3 * 192 * 16 * 2
    )

    def want(name):
        return only is None or only == name

    if want("dec0_mono"):
        x = mk((1, 176, 176, 176, 240))
        run("dec0_mono", dec0_tail, (x,), fl)
        del x
        gc.collect()

    if want("dec0_b58"):
        x = mk((27, 60, 60, 60, 240))
        run("dec0_b58", dec0_tail, (x,), fl)
        del x
        gc.collect()

    if want("dec0_b29"):
        x = mk((216, 31, 31, 31, 240))
        run("dec0_b29", dec0_tail, (x,), fl)
        del x
        gc.collect()

    # --- enc0 head --------------------------------------------------------
    w_e0 = mk((2, 2, 2, 8, 192))
    w_e1 = mk((2, 2, 2, 192, 192))

    def enc0_head(x):
        y = jax.nn.relu(conv(x, w_e0))
        return jax.nn.relu(conv(y, w_e1))

    fl_e = 193**3 * 8 * 8 * 192 * 2 + 192**3 * 8 * 192 * 192 * 2

    if want("enc0_mono"):
        x = mk((1, 194, 194, 194, 8))
        run("enc0_mono", enc0_head, (x,), fl_e)
        del x
        gc.collect()

    if want("enc0_b64"):
        x = mk((27, 66, 66, 66, 8))
        run("enc0_b64", enc0_head, (x,), fl_e)
        del x
        gc.collect()

    if want("enc0_b48"):
        x = mk((64, 50, 50, 50, 8))
        run("enc0_b48", enc0_head, (x,), fl_e)
        del x
        gc.collect()

    if want("enc0_b32"):
        # out 32^3 x 6^3 tiles 192^3 exactly (1.20x halo redundancy) —
        # the dec0_b29-scale block; b48 hit 114.7 vs mono 92.1
        x = mk((216, 34, 34, 34, 8))
        run("enc0_b32", enc0_head, (x,), fl_e)
        del x
        gc.collect()


if __name__ == "__main__":
    main()
