"""Is B2's residual in-chain slowness a layout problem? (round 3)

With the barrier, B2 still costs ~13.6 ms in-chain vs 2.7 standalone.
Probe: run stage A + split in ONE jit, B2 in ANOTHER jit — the jit
boundary forces default layouts on the intermediate.  If cross-boundary
B2 is fast, the in-chain loss is the materialized split buffer's layout
(a two-phase slab design could fix it); if it is still slow, the
standalone number is the artifact and in-chain B2 is at its true cost.

Also times B2 standalone on (a) a fresh random buffer and (b) the
actual split output values — same shapes, distinguishes layout from
value effects (there should be none).

python experiments/chain_fix3.py
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
    tin = pspec.valid_size(64 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    params = variables["params"]
    dt = pm.dtype
    B = 16
    tiles = jnp.asarray(
        rng.integers(0, 255, (B, tin, tin, tin)), jnp.uint8
    )
    n_lead = pm.n_lead

    open("experiments/chain_fix3.jsonl", "w").close()

    def rec(name, dtm):
        row = {"name": name, "ms": round(dtm * 1e3, 2)}
        print(json.dumps(row), flush=True)
        with open("experiments/chain_fix3.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    @jax.jit
    def stage_a_split(tiles):
        x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
        x = pack_volume(x.astype(dt))
        for i in range(n_lead):
            w = params[f"Conv_{i}"]["kernel"].astype(dt)
            b = params[f"Conv_{i}"]["bias"].astype(dt)
            x = jax.nn.relu(conv(x, pack_weight_d1(w)) + jnp.tile(b, 8))
        b0, d, h, w_, c8 = x.shape
        c = c8 // 8
        x = x.reshape(b0, d, h, w_, 8, c)
        return x.transpose(0, 4, 1, 2, 3, 5).reshape(b0 * 8, d, h, w_, c)

    split_out = jax.block_until_ready(stage_a_split(tiles))
    w2 = params[f"Conv_{n_lead}"]["kernel"].astype(dt)
    b2 = params[f"Conv_{n_lead}"]["bias"].astype(dt)

    def b2_conv(x):
        return jax.nn.relu(conv(x, w2) + b2)

    # (a) standalone on a fresh random buffer (round-2 'parts' method)
    fresh = jnp.asarray(
        rng.normal(size=split_out.shape), dt
    )
    rec("B2_fresh_buffer", timeit(b2_conv, (fresh,)))

    # (b) standalone on the actual cross-jit split output
    rec("B2_cross_jit_split_output", timeit(b2_conv, (split_out,)))

    # (c) the two jits chained back-to-back per iteration (dispatch
    # overhead included once per iteration inside the scan is not
    # possible across jits — time them separately and sum)
    rec("stageA_split_alone", timeit(
        lambda t: stage_a_split(t), (tiles,)))


if __name__ == "__main__":
    main()
