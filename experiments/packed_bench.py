"""A/B: packed vs plain forward + end-to-end pipeline on the real TPU.

python experiments/packed_bench.py [size]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from flypylib_tpu.models.zoo import baseline_model, vgg_like
from flypylib_tpu.ops.packed_conv import packed_spec


def force(x):
    return float(jnp.sum(x))


def time_fwd(spec, variables, size, iters=10, dtype=jnp.float32):
    """Device time per forward: `iters` forwards chained in ONE lax.scan
    dispatch (the tunnel's per-dispatch overhead would otherwise swamp
    ~20 ms kernels); a per-iteration input tweak defeats CSE."""
    s = spec.valid_size(size)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, s, s, s, 1)).astype(np.float32)
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def f_many(v, x, n):
        def body(acc, i):
            xi = x + (i.astype(jnp.float32) * 1e-7)
            p = jax.nn.sigmoid(spec.module.apply(v, xi, train=False))
            return acc + jnp.sum(p), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    force(f_many(variables, x, n=1))  # compile n=1
    force(f_many(variables, x, n=iters))  # compile n=iters
    t0 = time.perf_counter()
    force(f_many(variables, x, n=1))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    force(f_many(variables, x, n=iters))
    t_n = time.perf_counter() - t0
    dt = (t_n - t_one) / (iters - 1)  # removes dispatch + transfer cost
    n_out = (s - 2 * spec.context) ** 3
    return dt, n_out / dt / 1e6, s


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 140
    results = []
    for name, mk in [("baseline", baseline_model), ("vgg_like", vgg_like)]:
        spec = mk()
        pspec = packed_spec(spec)
        variables = spec.init(jax.random.PRNGKey(0), spec.valid_size(33))
        for tag, sp in [("plain", spec), ("packed", pspec)]:
            try:
                dt, mvox, s = time_fwd(sp, variables, size)
                row = {"model": name, "path": tag, "size": s,
                       "ms": round(dt * 1e3, 1), "mvox_s": round(mvox, 1)}
            except Exception as e:
                row = {"model": name, "path": tag, "error": str(e)[:300]}
            results.append(row)
            print(json.dumps(row), flush=True)
    with open("experiments/packed_bench.jsonl", "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
