"""Per-stage scan-timed profile of plain vs packed forwards on TPU.

All timings chain `iters` executions inside one lax.scan dispatch and
subtract a single-iteration run, so tunnel dispatch overhead cancels
(the earlier queued-dispatch sweep overstated small kernels).

python experiments/packed_profile.py [size]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.packed_conv import (
    pack_volume, pack_weight_d1, parity_merge, parity_split,
)


def scan_time(f, args, iters=10):
    """Time f(*args) by chaining iters runs in one dispatch."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            # perturb the first arg per iteration to defeat CSE
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


def conv(x, w, dil=1):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", rhs_dilation=(dil,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 140
    rng = np.random.default_rng(0)
    rows = []

    def rec(name, dt, flops=None):
        row = {"name": name, "ms": round(dt * 1e3, 2)}
        if flops:
            row["tflops"] = round(flops / dt / 1e12, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    bf = jnp.bfloat16
    s = size if size % 2 == 0 else size + 1
    h = s // 2

    def arr(shape, dtype=bf):
        return jnp.asarray(rng.normal(size=shape), dtype)

    def wconv(k, ci, co):
        return jnp.asarray(rng.normal(size=(k, k, k, ci, co)) * 0.1, bf)

    # --- plain layers (baseline stack), scan-timed ----------------------
    for name, ci, co, dil in [
        ("plain_L1_1to24_d1", 1, 24, 1),
        ("plain_L2_24to32_d1", 24, 32, 1),
        ("plain_L3_32to48_d2", 32, 48, 2),
        ("plain_L4_48to64_d2", 48, 64, 2),
    ]:
        x = arr((1, s, s, s, ci))
        w = wconv(3, ci, co)
        d = 2 * dil
        fl = 2 * (s - d) ** 3 * 27 * ci * co
        rec(name, scan_time(lambda x, w: conv(x, w, dil), (x, w)), fl)

    # --- packed stage A layers ------------------------------------------
    for name, ci, co in [
        ("packed_L1_8to192_k2", 8, 192),
        ("packed_L2_192to256_k2", 192, 256),
    ]:
        x = arr((1, h, h, h, ci))
        w = wconv(2, ci, co)
        fl = 2 * (h - 1) ** 3 * 8 * ci * co
        rec(name, scan_time(lambda x, w: conv(x, w), (x, w)), fl)

    # --- packed stage B layers (parity batch 8) --------------------------
    for name, ci, co in [
        ("packed_L3_b8_32to48_d1", 32, 48),
        ("packed_L4_b8_48to64_d1", 48, 64),
    ]:
        x = arr((8, h, h, h, ci))
        w = wconv(3, ci, co)
        fl = 2 * 8 * (h - 2) ** 3 * 27 * ci * co
        rec(name, scan_time(lambda x, w: conv(x, w), (x, w)), fl)

    # --- relayouts --------------------------------------------------------
    x = arr((1, s, s, s, 1), jnp.float32)
    rec("pack_volume_f32", scan_time(lambda x: pack_volume(x), (x,)))
    xp = arr((1, h, h, h, 256))
    rec("parity_transpose_256ch", scan_time(
        lambda x: x.reshape(1, h, h, h, 8, 32).transpose(0, 4, 1, 2, 3, 5)
        .reshape(8, h, h, h, 32) * 1.0,
        (xp,),
    ))
    xb = arr((8, h, h, h, 1), jnp.float32)
    rec("parity_merge_out", scan_time(lambda x: parity_merge(x), (xb,)))

    # --- head: 1x1 convs --------------------------------------------------
    xh = arr((8, h, h, h, 64))
    wh = wconv(1, 64, 96)
    rec("head_64to96_1x1", scan_time(lambda x, w: conv(x, w), (xh, wh)),
        2 * 8 * h**3 * 64 * 96)
    xl = arr((8, h, h, h, 96))
    wl = jnp.asarray(rng.normal(size=(1, 1, 1, 96, 1)) * 0.1, jnp.float32)
    rec("logits_96to1_f32", scan_time(
        lambda x, w: conv(x.astype(jnp.float32), w), (xl, wl)),
        2 * 8 * h**3 * 96)

    with open("experiments/packed_profile.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps({"size": size, **r}) + "\n")
    print("== done ==")


if __name__ == "__main__":
    main()
