"""TPU sweep: XLA conv3d throughput vs channel width / kernel / dilation.

Round-2 perf headline (VERDICT item 1): decide between space-to-depth
channel packing, per-parity dilation decomposition, and grouped packed
convs by measuring what XLA's conv lowering actually delivers at each
operating point.  Timing uses queued dispatches + one forced transfer
(the tunnel's block_until_ready is a no-op; see CLAUDE.md).

Run: python experiments/conv_sweep.py [--quick]
Appends one JSON line per config to experiments/conv_sweep.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))  # force compile + first run
    # measure dispatch/roundtrip overhead with an empty-ish op
    t0 = time.perf_counter()
    float(jnp.sum(out))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0 - overhead) / iters
    return max(dt, 1e-9)


def conv_flops(shape_out, k, ci, co):
    return 2 * int(np.prod(shape_out)) * (k**3) * ci * co


def bench_conv(size, ci, co, k=3, dil=1, batch=1, groups=1, dtype=jnp.bfloat16):
    d = dil * (k - 1)  # context*2
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, size, size, size, ci)),
        dtype,
    )
    w = jnp.asarray(
        np.random.default_rng(1).normal(
            size=(k, k, k, ci // groups, co)
        ),
        dtype,
    )

    @jax.jit
    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            rhs_dilation=(dil,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    dt = timeit(f, x, w)
    out_sp = (batch, size - d, size - d, size - d)
    fl = conv_flops(out_sp, k, ci // groups, co)
    return dt, fl / dt / 1e12


def bench_matmul(n=8192, dtype=jnp.bfloat16):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)), dtype)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(n, n)), dtype)
    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(dtype))
    dt = timeit(f, a, b, iters=10)
    return dt, 2 * n**3 / dt / 1e12


def main():
    quick = "--quick" in sys.argv
    out_path = "experiments/conv_sweep.jsonl"
    results = []

    def record(name, dt, tflops, **kw):
        row = {"name": name, "ms": round(dt * 1e3, 3),
               "tflops": round(tflops, 2), **kw}
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    dt, tf = bench_matmul(4096 if quick else 8192)
    record("matmul_peak", dt, tf)

    # the baseline stack's actual layers (140^3-ish tiles)
    cfgs = [
        # name, size, ci, co, k, dil, batch, groups
        ("L1_1to24_d1", 140, 1, 24, 3, 1, 1, 1),
        ("L2_24to32_d1", 140, 24, 32, 3, 1, 1, 1),
        ("L3_32to48_d2", 140, 32, 48, 3, 2, 1, 1),
        ("L4_48to64_d2", 140, 48, 64, 3, 2, 1, 1),
        # does dilation itself hurt?
        ("L3_32to48_d1", 140, 32, 48, 3, 1, 1, 1),
        # big channels, same spatial scale class
        ("C128_d1", 96, 128, 128, 3, 1, 1, 1),
        ("C256_d1", 72, 256, 256, 3, 1, 1, 1),
        # space-to-depth regime: half spatial, 8x channels, 2^3 kernel
        ("s2d_L2_192to256_k2", 70, 192, 256, 2, 1, 1, 1),
        ("s2d_L3_256to384_k2", 70, 256, 384, 2, 1, 1, 1),
        # s2d with 3^3 kernel (overlap-heavier rewrite)
        ("s2d_192to256_k3", 70, 192, 256, 3, 1, 1, 1),
        # per-parity dilation decomposition: batch=8 of half-size d1
        ("parity_L3_b8_d1", 70, 32, 48, 3, 1, 8, 1),
        ("parity_L4_b8_d1", 70, 48, 64, 3, 1, 8, 1),
        # grouped packed conv for d2 layers (4^3 mixed-radix idea)
        ("grp8_256to384_k2", 35, 256, 384, 2, 1, 8, 8),
    ]
    if quick:
        cfgs = cfgs[:4]
    for name, size, ci, co, k, dil, batch, groups in cfgs:
        try:
            dt, tf = bench_conv(size, ci, co, k, dil, batch, groups)
            record(name, dt, tf, size=size, ci=ci, co=co, k=k, dil=dil,
                   batch=batch, groups=groups)
        except Exception as e:
            print(json.dumps({"name": name, "error": str(e)[:200]}),
                  flush=True)

    print("== summary ==")
    for r in results:
        print(f"{r['name']:24s} {r['ms']:9.2f} ms  {r['tflops']:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
