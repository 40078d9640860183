"""Fix probes for the B2 chain anomaly (experiments/chain_prefix.jsonl).

The first stage-B conv costs 16.5 ms in-chain vs 2.7 ms standalone —
the parity_split transpose composes badly with the conv that consumes
it.  Variants (all cumulative through B2 unless noted):

- ``base_B2``      production structure re-measured (split -> conv)
- ``barrier_B2``   lax.optimization_barrier between split and conv
- ``copy_B2``      explicit on-device copy of the split output
- ``group_B2``     NO split: dilation-2 conv == feature_group_count=8
                   conv on the packed tensor (kernel tiled per group)
- ``group_full``   whole chain with stage B + head + logits grouped in
                   the packed domain (split/merge gone entirely)
- ``base_full``    production full chain re-measured

python experiments/chain_fix.py
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
    parity_split,
    packed_spec,
    unpack_volume,
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

    rows = []
    open("experiments/chain_fix.jsonl", "w").close()

    def rec(name, dtm):
        row = {"name": name, "ms": round(dtm * 1e3, 2),
               "mvox_s": round(out_vox / dtm / 1e6, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/chain_fix.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    def conv(x, w, dil=1, fgc=1):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID", rhs_dilation=(dil,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=fgc,
        )

    def stage_a(tiles):
        x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
        x = pack_volume(x.astype(dt))
        for i in range(n_lead):
            w = params[f"Conv_{i}"]["kernel"].astype(dt)
            b = params[f"Conv_{i}"]["bias"].astype(dt)
            x = jax.nn.relu(conv(x, pack_weight_d1(w)) + jnp.tile(b, 8))
        return x

    def split(x):
        b0, d, h, w_, c8 = x.shape
        c = c8 // 8
        x = x.reshape(b0, d, h, w_, 8, c)
        return x.transpose(0, 4, 1, 2, 3, 5).reshape(b0 * 8, d, h, w_, c)

    def b2_weights():
        w = params[f"Conv_{n_lead}"]["kernel"].astype(dt)
        b = params[f"Conv_{n_lead}"]["bias"].astype(dt)
        return w, b

    def base_b2(tiles):
        x = split(stage_a(tiles))
        w, b = b2_weights()
        return jax.nn.relu(conv(x, w) + b)

    rec("base_B2", timeit(base_b2, (tiles,)))

    def barrier_b2(tiles):
        x = lax.optimization_barrier(split(stage_a(tiles)))
        w, b = b2_weights()
        return jax.nn.relu(conv(x, w) + b)

    rec("barrier_B2", timeit(barrier_b2, (tiles,)))

    def group_b2(tiles):
        x = stage_a(tiles)  # packed: (B, d, h, w, 8*32)
        w, b = b2_weights()
        wg = jnp.tile(w, (1, 1, 1, 1, 8))
        return jax.nn.relu(conv(x, wg, fgc=8) + jnp.tile(b, 8))

    rec("group_B2", timeit(group_b2, (tiles,)))

    def full_base(tiles):
        x = split(stage_a(tiles))
        for i in range(n_lead, n_body):
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

    rec("base_full", timeit(full_base, (tiles,)))

    def full_group(tiles):
        x = stage_a(tiles)  # packed
        for i in range(n_lead, n_body):
            w = params[f"Conv_{i}"]["kernel"].astype(dt)
            b = params[f"Conv_{i}"]["bias"].astype(dt)
            x = jax.nn.relu(
                conv(x, jnp.tile(w, (1, 1, 1, 1, 8)), fgc=8)
                + jnp.tile(b, 8)
            )
        w = params[f"Conv_{n_body}"]["kernel"].astype(dt)
        b = params[f"Conv_{n_body}"]["bias"].astype(dt)
        x = jax.nn.relu(
            conv(x, jnp.tile(w, (1, 1, 1, 1, 8)), fgc=8).astype(dt)
            + jnp.tile(b, 8)
        )
        wl = params[f"Conv_{n_body + 1}"]["kernel"].astype(jnp.float32)
        bl = params[f"Conv_{n_body + 1}"]["bias"].astype(jnp.float32)
        w_hi = wl.astype(dt)
        w_lo = (wl - w_hi.astype(jnp.float32)).astype(dt)
        wcat = jnp.concatenate([w_hi, w_lo], axis=-1)  # (1,1,1, 96, 2)
        y = lax.conv_general_dilated(
            x.astype(dt), jnp.tile(wcat, (1, 1, 1, 1, 8)), (1, 1, 1),
            "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=8,
            preferred_element_type=jnp.float32,
        )  # (B, d, h, w, 8*2) group-major [hi, lo] pairs
        y = y.reshape(*y.shape[:-1], 8, 2)
        x = y[..., 0] + y[..., 1] + bl
        return jax.nn.sigmoid(unpack_volume(x)[..., 0])

    rec("group_full", timeit(full_group, (tiles,)))

    # numerical sanity: group_full == base_full (same re-association)
    a = np.asarray(full_base(tiles)[..., 0].astype(jnp.float32))
    g = np.asarray(full_group(tiles))
    print(json.dumps({
        "check_max_abs_diff": float(np.max(np.abs(a - g))),
    }), flush=True)


if __name__ == "__main__":
    main()
