"""enc0 (level-0 encoder pair) through the fused Pallas chain — round 5.

The last unmeasured level-0 native-layout formulation: the encoder's
two packed convs (8->192, 192->192 at ~194^3 cells) are exactly a
:func:`packed_tail` stage chain (2^3 convs + ReLU, no logits).  Round-6
lore says standalone wins can invert in-chain, so this measures
STANDALONE first as the cheap gate: if the kernel cannot beat the XLA
pair standalone, the in-chain integration is dead on arrival (the
round-7b boundary tax only subtracts).

python experiments/unet_enc0_kernel.py [cells] [bz by ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import pack_weight_d1
from flypylib_tpu.ops.pallas_tail import packed_tail
from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "experiments/unet_enc0_kernel.jsonl"


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")


def timeit_scalar(fn, *args, iters=4, reps=3):
    """Time a SCALAR-returning jit: enqueued iterations then hold only
    f32 scalars (a full-tensor-returning loop keeps all iters' 2.7 GB
    outputs alive at once — dispatch-time allocation — and OOMs)."""
    float(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    args = [int(a) for a in sys.argv[1:]]
    cells = args[0] if args else 194  # tin 388 -> 194 packed cells
    blocks = [tuple(args[i : i + 2]) for i in range(1, len(args), 2)]
    if not blocks:
        blocks = [(3, 3), (2, 2)]

    spec = unet()
    dt = spec.module.dtype
    small = spec.min_size
    variables = spec.module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, small, small, small, 1), jnp.float32), train=False,
    )
    params = variables["params"]
    stages = []
    for i in range(2):
        stages.append(
            (
                pack_weight_d1(params[f"Conv_{i}"]["kernel"].astype(dt)),
                jnp.tile(params[f"Conv_{i}"]["bias"].astype(dt), 8),
            )
        )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((cells, cells, cells, 8)), dt
    )
    co = stages[-1][0].shape[-1]
    vox_out = (cells - 2) ** 3 * 8  # full-res voxels through the pair
    flops = (
        2 * (cells - 1) ** 3 * 8 * 8 * co
        + 2 * (cells - 2) ** 3 * 8 * co * co
    )

    def xla_pair(x):
        from jax import lax

        h = x
        for w, b in stages:
            h = lax.conv_general_dilated(
                h[None], w, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )[0]
            h = jnp.maximum(h + b, 0.0)
        return h

    fxla = jax.jit(xla_pair)
    fxla_s = jax.jit(
        lambda x: jnp.sum(xla_pair(x), dtype=jnp.float32)
    )
    t0 = time.perf_counter()
    ref = fxla(x)
    ref.block_until_ready()
    emit({"variant": "xla_pair", "cells": cells,
          "compile_s": round(time.perf_counter() - t0, 1)})
    dtm = timeit_scalar(fxla_s, x)
    emit({"variant": "xla_pair", "cells": cells, "ms": round(dtm * 1e3, 2),
          "tf_s": round(flops / dtm / 1e12, 1),
          "mvox_s": round(vox_out / dtm / 1e6, 1)})

    @jax.jit
    def diff(a, b):
        # per-z-slice f32 diff (a whole-tensor f32 cast pair OOMs here)
        def body(c, i):
            d = jnp.abs(
                a[i].astype(jnp.float32) - b[i].astype(jnp.float32)
            ).max()
            return jnp.maximum(c, d), None

        m, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(a.shape[0]))
        return m
    for bz, by in blocks:
        name = f"pallas_b{bz}x{by}"
        try:
            def kern(x, bz=bz, by=by):
                return packed_tail(
                    x, stages, None, block=(bz, by, 1 << 30),
                    interpret=jax.default_backend() != "tpu",
                )

            fk = jax.jit(kern)
            fk_s = jax.jit(
                lambda x, kern=kern: jnp.sum(kern(x), dtype=jnp.float32)
            )
            t0 = time.perf_counter()
            out = fk(x)
            md = float(diff(out, ref))
            emit({"variant": name, "cells": cells, "max_diff": md,
                  "compile_s": round(time.perf_counter() - t0, 1)})
            del out
            dtm = timeit_scalar(fk_s, x)
            emit({"variant": name, "cells": cells,
                  "ms": round(dtm * 1e3, 2),
                  "tf_s": round(flops / dtm / 1e12, 1),
                  "mvox_s": round(vox_out / dtm / 1e6, 1)})
        except Exception as e:
            emit({"variant": name, "cells": cells,
                  "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
