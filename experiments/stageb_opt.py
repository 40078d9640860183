"""Stage-B (dilated-layer) conv alternatives — the 82%-of-FLOPs lever.

The packed engine's stage B runs L3 (32->48) / L4 (48->64) as batch-8
dilation-1 convs on parity lattices at 31.8 / 53 TFLOP/s (packed_profile):
output channels < 128 under-fill the MXU lanes.  Measured here (each row
appended to stageb_opt.jsonl as it lands):

- direct        : current lax conv (reference rate)
- copad128      : zero-pad Co to 128 (full lanes, wasted columns)
- repack8       : space-to-depth the parity lattices again (2^3 kernel,
                  8x channels, 2.37x redundant FLOPs — like stage A)
- wino gemm     : the F(2,3)^3 winograd core batched matmul
                  (64, M, Ci) @ (64, Ci, Co), both layout orientations —
                  its rate ceiling decides whether a fused Pallas
                  winograd kernel could beat direct (3.375x fewer FLOPs)
- forward sweep : DetectPipeline.forward_staged at 256^3 over
                  (tile_out, tile_batch) — tile halo redundancy is
                  (tin/tile_out)^3: 1.31x at 128, 1.15x at 256

TFLOP/s figures are *dense-equivalent* (the dense conv's FLOPs / time) so
rows compare directly as end-to-end speedups.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.ops.packed_conv import (
    pack_volume,
    pack_weight_d1,
    unpack_volume,
)


def scan_time(f, args, iters=8):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype) * 1e-7
            out = f(first, *args[1:])
            return acc + sum(
                jnp.sum(o).astype(jnp.float32) for o in jax.tree.leaves(out)
            ), None

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


def _conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def rec(row):
    print(json.dumps(row), flush=True)
    with open("experiments/stageb_opt.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


def bench_layers():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # L3: (8, 68^3, 32) -> (8, 66^3, 48); L4: (8, 66^3, 48) -> (8, 64^3, 64)
    for name, (b, s, ci, co) in {
        "L3": (8, 68, 32, 48),
        "L4": (8, 66, 48, 64),
    }.items():
        x = jnp.asarray(rng.normal(0, 1, (b, s, s, s, ci)), dt)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, ci, co)), dt)
        so = s - 2
        dense_flops = 2 * 27 * ci * co * b * so**3

        def row(tag, dtv):
            rec({
                "name": f"{name}_{tag}", "ms": round(dtv * 1e3, 2),
                "tflops_dense_eq": round(dense_flops / dtv / 1e12, 1),
            })

        row("direct", scan_time(lambda x, w: _conv(x, w), (x, w)))

        wp = jnp.concatenate(
            [w, jnp.zeros((3, 3, 3, ci, 128 - co), dt)], axis=-1
        )
        row("copad128",
            scan_time(lambda x, wp: _conv(x, wp)[..., :co], (x, wp)))

        wpk = pack_weight_d1(w)
        row("repack8", scan_time(
            lambda x, wpk: unpack_volume(_conv(pack_volume(x), wpk)),
            (x, wpk),
        ))

        # winograd core gemm rate, both orientations (M = blocks)
        md = (s - 2) // 2
        m = b * md**3
        wino_flops = 2 * 64 * m * ci * co  # = dense/3.375
        u = jnp.asarray(rng.normal(0, 0.1, (64, ci, co)), dt)
        v1 = jnp.asarray(rng.normal(0, 1, (64, m, ci)), dt)
        t = scan_time(
            lambda v, u: jnp.einsum(
                "tmi,tio->tmo", v, u, preferred_element_type=jnp.float32
            ),
            (v1, u),
        )
        rec({
            "name": f"{name}_wino_gemm_ch_last", "ms": round(t * 1e3, 2),
            "tflops_raw": round(wino_flops / t / 1e12, 1),
            "tflops_dense_eq": round(dense_flops / t / 1e12, 1),
        })
        del v1
        v2 = jnp.asarray(rng.normal(0, 1, (64, ci, m)), dt)
        t = scan_time(
            lambda v, u: jnp.einsum(
                "tim,tio->tom", v, u, preferred_element_type=jnp.float32
            ),
            (v2, u),
        )
        rec({
            "name": f"{name}_wino_gemm_ch_first", "ms": round(t * 1e3, 2),
            "tflops_raw": round(wino_flops / t / 1e12, 1),
            "tflops_dense_eq": round(dense_flops / t / 1e12, 1),
        })
        del v2


def bench_forward_tiles():
    from flypylib_tpu.infer.pipeline import DetectPipeline
    from flypylib_tpu.models.zoo import baseline_model
    from flypylib_tpu.ops.packed_conv import packed_spec

    spec = packed_spec(baseline_model())
    variables = spec.init(jax.random.PRNGKey(0), 140)
    rng = np.random.default_rng(0)
    vol = (rng.random((256, 256, 256)) * 255).astype(np.uint8)

    for tile_out, tile_batch in ((128, 4), (128, 8), (256, 1), (64, 8)):
        pipe = DetectPipeline(
            spec, variables, vol.shape, tile_out=tile_out,
            tile_batch=tile_batch, window=5, threshold=0.5,
        )
        staged = pipe.stage(vol)
        out = pipe.forward_staged(staged)
        float(jnp.sum(out))
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(jnp.sum(pipe.forward_staged(staged)))
            times.append(time.perf_counter() - t0)
        dtv = min(times)
        rec({
            "name": f"fwd256_tile{tile_out}_b{tile_batch}",
            "ms": round(dtv * 1e3, 2),
            "mvox_s": round(vol.size / dtv / 1e6, 1),
        })


if __name__ == "__main__":
    bench_layers()
    bench_forward_tiles()
