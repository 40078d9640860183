"""Cumulative-prefix timing of the packed forward chain at t64b16.

fwd_structure2.py showed the composed chain runs 165 Mvox/s whether or
not it sits in a scan — the loss vs the per-layer parts-sum is INSIDE
the chain.  This measures cumulative prefixes of PackedConvStack's
forward (same ops, same order, mirrored here with the module's own
helpers) so each increment attributes the cost of one stage:

  pack     pack_volume + u8 cast/scale
  A0, A1   stage-A packed convs (2^3, 8->192, 192->256)
  split    packed channels -> parity-batched lattices
  B2, B3   stage-B dilation convs (48, 64 ch on parity lattices)
  head     1x1 conv 64->96 + relu
  logits   split-weight bf16 1x1 + f32 accum
  merge    parity_merge x1 + sigmoid

python experiments/chain_prefix.py
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
    PackedConvStack,
    pack_volume,
    pack_weight_d1,
    parity_merge,
    parity_split,
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
    pspec = packed_spec(spec)
    pm: PackedConvStack = pspec.module
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

    def stage(upto):
        """Forward prefix: run the chain up to (and incl.) step `upto`."""

        def f(tiles):
            x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            x = x.astype(dt)
            steps = 0

            def done(v):
                return v  # marker for readability

            x = pack_volume(x)
            steps += 1  # "pack"
            if steps >= upto:
                return done(x)
            i = 0
            for i in range(n_lead):
                w = params[f"Conv_{i}"]["kernel"].astype(dt)
                b = params[f"Conv_{i}"]["bias"].astype(dt)
                x = lax.conv_general_dilated(
                    x, pack_weight_d1(w), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + jnp.tile(b, 8)
                x = jax.nn.relu(x)
                steps += 1  # "A{i}"
                if steps >= upto:
                    return done(x)
            b0, d, h, w_, c8 = x.shape
            c = c8 // 8
            x = x.reshape(b0, d, h, w_, 8, c)
            x = x.transpose(0, 4, 1, 2, 3, 5).reshape(b0 * 8, d, h, w_, c)
            level = 1
            steps += 1  # "split"
            if steps >= upto:
                return done(x)
            for i in range(n_lead, n_body):
                dd = pm.dilations[i]
                while (1 << level) < dd:
                    x = parity_split(x)
                    level += 1
                w = params[f"Conv_{i}"]["kernel"].astype(dt)
                b = params[f"Conv_{i}"]["bias"].astype(dt)
                x = lax.conv_general_dilated(
                    x, w, (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + b
                x = jax.nn.relu(x)
                steps += 1  # "B{i}"
                if steps >= upto:
                    return done(x)
            w = params[f"Conv_{n_body}"]["kernel"].astype(dt)
            b = params[f"Conv_{n_body}"]["bias"].astype(dt)
            x = lax.conv_general_dilated(
                x, w, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ).astype(dt) + b
            x = jax.nn.relu(x)
            steps += 1  # "head"
            if steps >= upto:
                return done(x)
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
            steps += 1  # "logits"
            if steps >= upto:
                return done(x)
            for _ in range(level):
                x = parity_merge(x)
            x = jax.nn.sigmoid(x)
            steps += 1  # "merge"
            return done(x)

        return f

    names = (["pack"] + [f"A{i}" for i in range(n_lead)] + ["split"]
             + [f"B{i}" for i in range(n_lead, n_body)]
             + ["head", "logits", "merge"])
    rows = []
    open("experiments/chain_prefix.jsonl", "w").close()
    prev = 0.0
    for k, name in enumerate(names, start=1):
        dtm = timeit(stage(k), (tiles,))
        row = {
            "prefix": name, "cum_ms": round(dtm * 1e3, 2),
            "delta_ms": round((dtm - prev) * 1e3, 2),
            "cum_mvox_s": round(out_vox / dtm / 1e6, 1),
        }
        prev = dtm
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/chain_prefix.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
