"""Attribute phase A's 52% share of the two-phase forward
(experiments/phase_split.py: 0.408 of 0.778 s at 512^3 t64b16) to its
component ops at the production shape (tile batch 16, tin 76):

  cast+pack -> conv1 (packed 8->192) -> epilogue -> conv2 (192->256)
  -> epilogue -> parity-split transpose

plus A/B variants of whichever dominates (iv-form pack, split via
strided slices, conv dtype variants).

python experiments/stagea_profile.py >> experiments/stagea_profile.jsonl
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def scan_time(f, args, iters=8, reps=3):
    """min over reps of ((time of n=iters) - (time of n=1)) / (iters-1)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            if jnp.issubdtype(args[0].dtype, jnp.floating):
                first = args[0] + i.astype(args[0].dtype) * 1e-7
            else:
                first = args[0]
            out = f(first, *args[1:])
            return acc + jnp.sum(
                jax.tree.leaves(out)[0].astype(jnp.float32)
            ), None

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
    return max(best, 1e-9)


def main():
    from bench import _flagship
    from flypylib_tpu.ops.packed_conv import (
        _conv,
        pack_volume,
        pack_volume_iv,
        pack_weight_d1,
    )
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    pm = pspec.module
    dt = pm.dtype
    params = variables["params"]
    B, tin = 16, 76
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, tin, tin, tin, 1), np.float32))

    w0 = pack_weight_d1(params["Conv_0"]["kernel"].astype(dt))
    w1 = pack_weight_d1(params["Conv_1"]["kernel"].astype(dt))

    def pack_only(x):
        return pack_volume(x.astype(dt))

    def pack_iv(x):
        return pack_volume_iv(x.astype(dt))

    def thru_conv1(x):
        x = pack_volume(x.astype(dt))
        x = _conv(x, w0)
        return pm._epilogue(variables, x, 0, dt)

    def thru_conv2(x):
        x = thru_conv1(x)
        x = _conv(x, w1)
        return pm._epilogue(variables, x, 1, dt)

    def full_a(x):
        return pm.apply_stage_a(variables, x)

    def conv1_alone(xp):
        return _conv(xp, w0)

    def conv2_alone(x1):
        return _conv(x1, w1)

    def split_alone(x2):
        b0, d, h, w_, c8 = x2.shape
        c = c8 // 8
        y = x2.reshape(b0, d, h, w_, 8, c)
        y = y.transpose(0, 4, 1, 2, 3, 5).reshape(b0 * 8, d, h, w_, c)
        return lax.optimization_barrier(y)

    def split_iv(x2):
        """Parity-major channels -> batch via 8 strided channel slices
        + concat on batch (no 6-D transpose)."""
        b0, d, h, w_, c8 = x2.shape
        c = c8 // 8
        parts = [x2[..., p * c:(p + 1) * c] for p in range(8)]
        return lax.optimization_barrier(jnp.concatenate(parts, axis=0))

    xp = pack_only(x0)
    x1 = thru_conv1(x0)
    x2 = thru_conv2(x0)

    cases = [
        ("pack_transpose", pack_only, (x0,)),
        ("pack_iv", pack_iv, (x0,)),
        ("pack+conv1+ep", thru_conv1, (x0,)),
        ("pack+conv1+ep+conv2+ep", thru_conv2, (x0,)),
        ("full_stage_a", full_a, (x0,)),
        ("conv1_alone", conv1_alone, (xp,)),
        ("conv2_alone", conv2_alone, (x1,)),
        ("split_alone", split_alone, (x2,)),
        ("split_iv", split_iv, (x2,)),
    ]
    for name, f, args in cases:
        ms = scan_time(f, args) * 1e3
        rec = {"name": name, "ms": round(ms, 3)}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
