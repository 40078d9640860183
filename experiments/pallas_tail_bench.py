"""Benchmark the fused Pallas decoder-tail kernel at the dec0 shape (round 6).

dec0 tail at the 1k^3 bench operating point (tin 388): xin (176^3, 240)
bf16 -> fold conv (240->192) -> relu -> conv (192->192) -> relu ->
split-weight logits dot (192->16, summed to 8) f32.  XLA anchors
(experiments/dec0_retile.jsonl, unet_prefix2.jsonl): mono standalone
90.05 ms; in-chain attribution ~124 ms (fold 74.7 collapsed at
52.9 TF/s + convs 22.4 + logits ~27); retiled-31^3 upper bound 140.5
TF/s for the fold alone.

Sweeps the Pallas block shape.  useful_tf_s counts the SAME dense
FLOPs as dec0_retile (the three stages' useful output voxels), so
numbers are directly comparable.

python experiments/pallas_tail_bench.py
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

from flypylib_tpu.ops.pallas_tail import packed_tail
from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "experiments/pallas_tail_bench.jsonl"
N = 176
C0, C1, C2, L = 240, 192, 192, 8


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def useful_tflops():
    f = 2 * (N - 1) ** 3 * 8 * C0 * C1
    f += 2 * (N - 2) ** 3 * 8 * C1 * C2
    f += 2 * (N - 2) ** 3 * C2 * 2 * L
    return f / 1e12


def timeit(fn, args, iters=8, reps=3):
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


def main():
    rng = np.random.default_rng(0)

    def mk(shape, dt=jnp.bfloat16, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    x = mk((N, N, N, C0))
    w1, b1 = mk((2, 2, 2, C0, C1)), mk((C1,))
    w2, b2 = mk((2, 2, 2, C1, C2)), mk((C2,))
    wlf = np.asarray(rng.standard_normal((C2, L)) * 0.1, np.float32)
    w_hi = jnp.asarray(wlf, jnp.bfloat16)
    w_lo = (jnp.asarray(wlf) - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    wl = jnp.concatenate([w_hi, w_lo], axis=-1)
    bl = jnp.asarray(rng.standard_normal((L,)), jnp.float32)
    tf = useful_tflops()

    # XLA anchor: same math, production form
    def xla_tail(x, w1, b1, w2, b2, wl, bl):
        def conv(x, w):
            return lax.conv_general_dilated(
                x[None], w, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )[0]

        t1 = jnp.maximum(conv(x, w1) + b1, 0.0)
        t2 = jnp.maximum(conv(t1, w2) + b2, 0.0)
        y2 = lax.dot_general(
            t2, wl, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y2[..., :L] + y2[..., L:] + bl

    # --only chain:2x2,fold:3x3 restricts which pallas variants run
    # (remote compiles cost minutes; probe cached/known-good blocks).
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            spec = a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1]
            only = set(spec.split(","))

    def want(kind, bz, by):
        return only is None or f"{kind}:{bz}x{by}" in only

    args = (x, w1, b1, w2, b2, wl, bl)
    if "--skip-anchor" not in sys.argv:
        dt = timeit(xla_tail, args)
        emit({"variant": "xla_mono", "ms": round(dt * 1e3, 2),
              "useful_tf_s": round(tf / dt, 1)})
    ref = np.asarray(jax.jit(xla_tail)(*args))

    # x is always full-width on TPU (Mosaic last-two-dims rule); sweep
    # (BZ, BY).  VMEM budget math: chain keeps in(x2 dbl-buf) + t1 + t2
    # at ~300 KB per (z,y) halo cell -> (BZ+2)(BY+2) <~ 50.
    for bz, by in [(2, 2), (2, 4), (4, 2), (4, 4), (2, 8), (8, 2),
                   (5, 5), (4, 8), (8, 4), (6, 6)]:
        if not want("chain", bz, by):
            continue
        gc.collect()
        name = f"pallas_chain_b{bz}x{by}"
        try:
            fn = lambda x, w1, b1, w2, b2, wl, bl: packed_tail(
                x, [(w1, b1), (w2, b2)], (wl, bl), block=(bz, by, N)
            )
            out = np.asarray(jax.jit(fn)(*args))
            md = float(np.abs(out - ref).max())
            rs = float(np.abs(ref).max())
            dt = timeit(fn, args)
            redun = (bz + 2) * (by + 2) / (bz * by)
            emit({"variant": name, "ms": round(dt * 1e3, 2),
                  "useful_tf_s": round(tf / dt, 1),
                  "redundancy": round(redun, 2),
                  "max_diff": md, "ref_scale": rs})
        except Exception as e:
            emit({"variant": name, "error": f"{type(e).__name__}: {e}"[:300]})

    # fold-only variant (single stage, 240->192): smaller live set ->
    # bigger blocks, redundancy (BZ+1)(BY+1)/(BZ*BY)
    def xla_fold(x, w1, b1):
        y = lax.conv_general_dilated(
            x[None], w1, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]
        return jnp.maximum(y + b1, 0.0)

    tf_fold = 2 * (N - 1) ** 3 * 8 * C0 * C1 / 1e12
    fargs = (x, w1, b1)
    if "--skip-anchor" not in sys.argv:
        dt = timeit(xla_fold, fargs)
        emit({"variant": "xla_fold", "ms": round(dt * 1e3, 2),
              "useful_tf_s": round(tf_fold / dt, 1)})
    fref = np.asarray(jax.jit(xla_fold)(*fargs)).astype(np.float32)
    for bz, by in [(2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7),
                   (8, 8), (4, 8), (8, 4), (10, 10)]:
        if not want("fold", bz, by):
            continue
        gc.collect()
        name = f"pallas_fold_b{bz}x{by}"
        try:
            fn = lambda x, w1, b1: packed_tail(
                x, [(w1, b1)], None, block=(bz, by, N)
            )
            out = np.asarray(jax.jit(fn)(*fargs)).astype(np.float32)
            md = float(np.abs(out - fref).max())
            dt = timeit(fn, fargs)
            redun = (bz + 1) * (by + 1) / (bz * by)
            emit({"variant": name, "ms": round(dt * 1e3, 2),
                  "useful_tf_s": round(tf_fold / dt, 1),
                  "redundancy": round(redun, 2), "max_diff": md})
        except Exception as e:
            emit({"variant": name, "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
