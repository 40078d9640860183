"""A/B the U-Net pool+repack at the 1k^3 shared-grid shape.

unet_prefix2 attributes 219 ms of the tin-388 packed U-Net forward to
pool0 — `pool_pack`'s 8 triple-strided slices, which were the FIX at
t128b2 (8.5 -> cheap) but appear pathological at covering-tile shapes
(the same regime where the one-shot pack/unpack transposes cost 7-15 GB
layout copies — BENCH_NOTES round 4).  Candidates, all bitwise-equal
to pool_pack by construction (pack_volume == pack_volume_iv is pinned):

  cur   : pool_pack (max -> 8 triple-strided slices + concat)
  iv    : pack_volume_iv(parity_group_max(x)) (max -> per-axis packs)
  iv_bar: iv with an optimization_barrier after the max
  cmax  : channel-slice max tree (no (...,8,C) reshape) -> pack_volume_iv
  xp    : old pack_volume(parity_group_max(x)) transpose form

Each is timed IN CONTEXT: pack -> enc0 convs -> pool -> one enc1 conv
(consumer forces a real layout), minus the same chain with the pool
replaced by a stride-2 subsample of matching output shape is NOT done —
we compare variants against each other; the chain prefix to enc0 is a
shared constant.

python experiments/pool_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import (
    pack_volume,
    pack_volume_iv,
    pack_weight_d1,
)
from flypylib_tpu.ops.packed_unet import parity_group_max, pool_pack
from flypylib_tpu.utils.cache import enable_compilation_cache


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


def pool_cmax(x):
    c8 = x.shape[-1]
    c = c8 // 8
    m = x[..., :c]
    for i in range(1, 8):
        m = jnp.maximum(m, x[..., i * c : (i + 1) * c])
    return pack_volume_iv(m)


def pool_iv(x):
    return pack_volume_iv(parity_group_max(x))


def pool_iv_bar(x):
    return pack_volume_iv(lax.optimization_barrier(parity_group_max(x)))


def pool_xp(x):
    return pack_volume(parity_group_max(x))


def pool_pack_first(x):
    """Per-axis de-interleave the FULL packed tensor (channels stay
    >= 8C at every step — no lane-padded C-wide intermediate), then max
    over the inner (fine-cell) parity: pack_volume_iv(x) has channel
    order (p, q, c), so the max over q is the pool."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    y = pack_volume_iv(x)
    b2, D, H, W, _ = y.shape
    return y.reshape(b2, D, H, W, 8, 8, c).max(axis=5).reshape(
        b2, D, H, W, c8
    )


def main():
    import sys

    tin = int(sys.argv[1]) if len(sys.argv) > 1 else 388
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    spec = unet()
    dt = jnp.bfloat16
    variables = spec.init(jax.random.PRNGKey(0), spec.min_size)
    params = variables["params"]

    tiles = jnp.asarray(
        rng.integers(0, 255, (batch, tin, tin, tin)), jnp.uint8
    )

    # correctness gate on a tiny CPU-sized tensor first
    small = jnp.asarray(
        rng.standard_normal((1, 8, 8, 8, 16)).astype(np.float32), dt
    )
    ref = pool_pack(small)
    for name, fn in [
        ("iv", pool_iv),
        ("iv_bar", pool_iv_bar),
        ("cmax", pool_cmax),
        ("xp", pool_xp),
        ("pack_first", pool_pack_first),
    ]:
        got = fn(small)
        assert got.shape == ref.shape and bool(
            jnp.all(got == ref)
        ), f"{name} mismatch"
    print("correctness ok", flush=True)

    def packed_conv_relu(x, i):
        w = pack_weight_d1(params[f"Conv_{i}"]["kernel"].astype(dt))
        b = params[f"Conv_{i}"]["bias"].astype(dt)
        y = lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + jnp.tile(b, 8)
        return jax.nn.relu(y)

    def chain(pool_fn, upto_pool_only=False):
        def f(tiles):
            x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            x = pack_volume_iv(x.astype(dt))
            x = packed_conv_relu(x, 0)
            x = packed_conv_relu(x, 1)
            x = pool_fn(x)
            if upto_pool_only:
                return x
            return packed_conv_relu(x, 2)

        return f

    variants = [
        ("cur", pool_pack),
        ("iv", pool_iv),
        ("iv_bar", pool_iv_bar),
        ("cmax", pool_cmax),
        ("xp", pool_xp),
        ("pack_first", pool_pack_first),
    ]
    if only:
        variants = [(n, f) for n, f in variants if n in only]
    base = None
    for name, fn in variants:
        dtm = timeit(chain(fn), (tiles,))
        row = {
            "variant": name,
            "tin": tin,
            "batch": batch,
            "chain_ms": round(dtm * 1e3, 2),
        }
        if base is None:
            base = dtm
        row["vs_first_ms"] = round((dtm - base) * 1e3, 2)
        print(json.dumps(row), flush=True)
        with open("experiments/pool_probe.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
