"""Probe: can z- or zy-packing lift the stage-B (parity-batch) convs?

Current stage B runs dilated layers as batch-8 dilation-1 3^3 convs at
32->48 / 48->64 channels (31.8 / 53 TFLOP/s scan-timed).  Candidates:
- z-pack: kernel (2,3,3), channels x2, 1.33x tap redundancy
- zy-pack: kernel (2,2,3), channels x4, 1.78x tap redundancy

Effective TFLOP/s = measured / redundancy, on the TRUE conv FLOPs.
Run exclusively: python experiments/stageb_pack.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def scan_time(f, args, iters=10):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype) * 1e-7
            out = f(first, *args[1:])
            return acc + jnp.sum(out).astype(jnp.float32), None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many(args, n=1))
    float(many(args, n=iters))
    t0 = time.perf_counter()
    float(many(args, n=1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(args, n=iters))
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1)


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    rows = []

    def rec(name, dt, true_flops, redundancy):
        row = {
            "name": name, "ms": round(dt * 1e3, 2),
            "eff_tflops": round(true_flops / dt / 1e12, 1),
            "redundancy": redundancy,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # true workload: batch-8 lattice 70^3, 3^3 valid conv
    for tag, ci, co in [("L3", 32, 48), ("L4", 48, 64)]:
        true_fl = 2 * 8 * 68**3 * 27 * ci * co

        x = jnp.asarray(rng.normal(size=(8, 70, 70, 70, ci)), bf)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.1, bf)
        rec(f"{tag}_direct", scan_time(conv, (x, w)), true_fl, 1.0)

        xz = jnp.asarray(rng.normal(size=(8, 35, 70, 70, 2 * ci)), bf)
        wz = jnp.asarray(
            rng.normal(size=(2, 3, 3, 2 * ci, 2 * co)) * 0.1, bf
        )
        rec(f"{tag}_zpack", scan_time(conv, (xz, wz)), true_fl,
            round(2 * 9 * 4 / (27 * 2), 2))

        xzy = jnp.asarray(rng.normal(size=(8, 35, 35, 70, 4 * ci)), bf)
        wzy = jnp.asarray(
            rng.normal(size=(2, 2, 3, 4 * ci, 4 * co)) * 0.1, bf
        )
        rec(f"{tag}_zypack", scan_time(conv, (xzy, wzy)), true_fl,
            round(2 * 2 * 3 * 16 / (27 * 4), 2))

    with open("experiments/stageb_pack.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
