"""Cumulative-prefix timing of the packed U-Net forward (tile 128, b2).

Same method as chain_prefix.py for the ConvStack: mirror
PackedUNet._forward with stop points and time cumulative prefixes so
each delta attributes one stage.  Round-3 state: 17.9 Mvox/s at 128^3
(fused decoder), target >= 40.

python experiments/unet_prefix.py
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
from flypylib_tpu.ops.packed_conv import pack_volume, pack_weight_d1
from flypylib_tpu.ops.packed_unet import (
    PackedUNet,
    convT_packed_weight,
    crop_packed,
    packed_unet_spec,
    parity_group_max,
    unpack_volume,
)


def timeit(fn, args, iters=10, reps=3):
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


def main():
    rng = np.random.default_rng(0)
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm: PackedUNet = pspec.module
    inner = pm.inner
    tin = pspec.valid_size(128 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    params = variables["params"]
    dt = pm.dtype
    B = 2
    tiles = jnp.asarray(
        rng.integers(0, 255, (B, tin, tin, tin)), jnp.uint8
    )
    tout = tin - 2 * pspec.context
    out_vox = B * tout ** 3
    cps = inner.convs_per_stage
    levels = inner.levels

    def forward_prefix(upto):
        def f(tiles):
            x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            state = {"steps": 0, "out": None}

            def step():
                state["steps"] += 1
                return state["steps"] >= upto

            conv_i = 0

            def packed_conv_relu(x, i):
                w = params[f"Conv_{i}"]["kernel"].astype(dt)
                b = params[f"Conv_{i}"]["bias"].astype(dt)
                y = lax.conv_general_dilated(
                    x, pack_weight_d1(w), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + jnp.tile(b, 8)
                return jax.nn.relu(y)

            x = pack_volume(x.astype(dt))
            if step():
                return x  # "pack"
            skips = []
            for lev in range(levels):
                for _ in range(cps):
                    x = packed_conv_relu(x, conv_i)
                    conv_i += 1
                if step():
                    return x  # f"enc{lev}"
                skips.append(x)
                x = pack_volume(parity_group_max(x))
                if step():
                    return x  # f"pool{lev}"
            for _ in range(cps):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            if step():
                return x  # "bottleneck"
            x = unpack_volume(x)
            if step():
                return x  # "unpackB"
            for lev in reversed(range(levels)):
                kT = params[f"ConvTranspose_{levels - 1 - lev}"]
                Kt = kT["kernel"].astype(jnp.float32)
                bT = kT["bias"].astype(jnp.float32)
                cu = Kt.shape[-1]
                cc = Kt.shape[-2]
                skip = skips[lev]
                cs = skip.shape[-1] // 8
                w_conv = params[f"Conv_{conv_i}"]["kernel"].astype(
                    jnp.float32)
                b_conv = params[f"Conv_{conv_i}"]["bias"].astype(
                    jnp.float32)
                wp = pack_weight_d1(w_conv)
                co8 = wp.shape[-1]
                wp = wp.reshape(2, 2, 2, 8, cs + cu, co8)
                w_skip = wp[..., :cs, :].reshape(2, 2, 2, 8 * cs, co8)
                w_up = wp[..., cs:, :]
                k_par = convT_packed_weight(Kt).reshape(cc, 8, cu)
                w_up_eff = jnp.einsum("cau,zyxauo->zyxco", k_par, w_up)
                w_fold = jnp.concatenate([w_skip, w_up_eff], axis=3)
                b_fold = jnp.tile(b_conv, 8) + jnp.einsum(
                    "u,zyxauo->o", bT, w_up)
                sizes = [2 * x.shape[i] for i in (1, 2, 3)]
                starts = [skip.shape[i] - x.shape[i] for i in (1, 2, 3)]
                sc = crop_packed(skip, starts, sizes)
                xin = jnp.concatenate([sc, x.astype(dt)], axis=-1)
                y = lax.conv_general_dilated(
                    xin, w_fold.astype(dt), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + b_fold.astype(dt)
                x = jax.nn.relu(y)
                conv_i += 1
                if step():
                    return x  # f"dec{lev}_fold"
                for _ in range(cps - 1):
                    x = packed_conv_relu(x, conv_i)
                    conv_i += 1
                if step():
                    return x  # f"dec{lev}_convs"
                if lev > 0:
                    x = unpack_volume(x)
                    if step():
                        return x  # f"dec{lev}_unpack"
            wl = params[f"Conv_{conv_i}"]["kernel"].astype(jnp.float32)
            bl = params[f"Conv_{conv_i}"]["bias"].astype(jnp.float32)
            w0 = wl[0, 0, 0]
            w_hi = w0.astype(dt)
            w_lo = (w0 - w_hi.astype(jnp.float32)).astype(dt)
            wcat = jnp.concatenate([w_hi, w_lo], axis=-1)
            b_, d, h, w_sp, c8 = x.shape
            xg = x.reshape(b_, d, h, w_sp, 8, c8 // 8)
            y = jax.lax.dot_general(
                xg, wcat, (((5,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y[..., 0] + y[..., 1] + bl
            return unpack_volume(y.reshape(b_, d, h, w_sp, 8))

        return f

    names = ["pack"]
    for lev in range(levels):
        names += [f"enc{lev}", f"pool{lev}"]
    names += ["bottleneck", "unpackB"]
    for lev in reversed(range(levels)):
        names += [f"dec{lev}_fold", f"dec{lev}_convs"]
        if lev > 0:
            names += [f"dec{lev}_unpack"]
    names += ["logits"]

    open("experiments/unet_prefix.jsonl", "w").close()
    prev = 0.0
    for k, name in enumerate(names, start=1):
        dtm = timeit(forward_prefix(k), (tiles,))
        row = {"prefix": name, "cum_ms": round(dtm * 1e3, 2),
               "delta_ms": round((dtm - prev) * 1e3, 2),
               "cum_mvox_s": round(out_vox / dtm / 1e6, 1)}
        prev = dtm
        print(json.dumps(row), flush=True)
        with open("experiments/unet_prefix.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
