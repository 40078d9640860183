"""Second round of B2-anomaly fixes: optimization_barrier placement.

chain_fix.jsonl: barrier after parity_split won (18.0 vs 21.3 ms through
B2); the all-grouped chain LOSES (41.8 ms — XLA lowers feature-group
convs poorly on TPU).  Measure the barrier in the FULL chain, and a
barrier before every stage-B conv.

python experiments/chain_fix2.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.packed_conv import (
    pack_volume,
    pack_weight_d1,
    parity_merge,
    packed_spec,
)


def timeit(fn, args, iters=10, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype)
            out = fn(first, *args[1:])
            return acc + jnp.sum(out).astype(jnp.float32), None

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


def main():
    rng = np.random.default_rng(0)
    spec = baseline_model()
    pspec = packed_spec(spec, stage_b="split")
    pm = pspec.module
    inner = pm.inner
    tin = pspec.valid_size(64 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    params = variables["params"]
    dt = pm.dtype
    B = 16
    tiles = jnp.asarray(
        rng.integers(0, 255, (B, tin, tin, tin)), jnp.uint8
    )
    tout = tin - 2 * pspec.context
    out_vox = B * tout ** 3
    n_body = len(inner.features)
    n_lead = pm.n_lead

    open("experiments/chain_fix2.jsonl", "w").close()

    def rec(name, dtm):
        row = {"name": name, "ms": round(dtm * 1e3, 2),
               "mvox_s": round(out_vox / dtm / 1e6, 1)}
        print(json.dumps(row), flush=True)
        with open("experiments/chain_fix2.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def full(barrier_split, barrier_each):
        def f(tiles):
            x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            x = pack_volume(x.astype(dt))
            for i in range(n_lead):
                w = params[f"Conv_{i}"]["kernel"].astype(dt)
                b = params[f"Conv_{i}"]["bias"].astype(dt)
                x = jax.nn.relu(conv(x, pack_weight_d1(w))
                                + jnp.tile(b, 8))
            b0, d, h, w_, c8 = x.shape
            c = c8 // 8
            x = x.reshape(b0, d, h, w_, 8, c)
            x = x.transpose(0, 4, 1, 2, 3, 5).reshape(
                b0 * 8, d, h, w_, c)
            if barrier_split:
                x = lax.optimization_barrier(x)
            for i in range(n_lead, n_body):
                if barrier_each and i > n_lead:
                    x = lax.optimization_barrier(x)
                w = params[f"Conv_{i}"]["kernel"].astype(dt)
                b = params[f"Conv_{i}"]["bias"].astype(dt)
                x = jax.nn.relu(conv(x, w) + b)
            w = params[f"Conv_{n_body}"]["kernel"].astype(dt)
            b = params[f"Conv_{n_body}"]["bias"].astype(dt)
            x = jax.nn.relu(conv(x, w).astype(dt) + b)
            wl = params[f"Conv_{n_body + 1}"]["kernel"].astype(jnp.float32)
            bl = params[f"Conv_{n_body + 1}"]["bias"].astype(jnp.float32)
            w_hi = wl.astype(dt)
            w_lo = (wl - w_hi.astype(jnp.float32)).astype(dt)
            y = lax.conv_general_dilated(
                x.astype(dt), jnp.concatenate([w_hi, w_lo], axis=-1),
                (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            )
            x = y[..., : wl.shape[-1]] + y[..., wl.shape[-1]:] + bl
            return jax.nn.sigmoid(parity_merge(x))

        return f

    rec("barrier_split_full", timeit(full(True, False), (tiles,)))
    rec("barrier_each_full", timeit(full(True, True), (tiles,)))
    rec("base_full", timeit(full(False, False), (tiles,)))


if __name__ == "__main__":
    main()
