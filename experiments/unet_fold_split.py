"""A/B the packed U-Net decoder fold: concat-conv vs split-conv-add.

unet_prefix.jsonl showed dec0_fold at 13.4 ms (t128b2) while the
same-FLOPs dec0 second conv costs 2.0 ms.  Hypothesis: the cost is the
full-res 240-channel ``concatenate([skip_cropped, x_up], -1)`` buffer
(HBM write+read of the largest tensor in the net), not the conv.
``conv(concat(a, b), concat(wa, wb)) == conv(a, wa) + conv(b, wb)``
exactly in f32 accumulation, so the concat can be deleted.

Variants (full packed forward at the bench operating point t96 b2):
  prod        production PackedUNet._forward (concat fold)
  split       y = conv(sc, w_skip) + conv(x, w_up_eff)   (bf16 outputs)
  split_bar   split with optimization_barrier on the cropped skip

python experiments/unet_fold_split.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

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
    pool_pack,
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


def make_forward(pm: PackedUNet, params, mode: str):
    inner = pm.inner
    dt = pm.dtype
    cps = inner.convs_per_stage
    levels = inner.levels

    def f(tiles):
        x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
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
        skips = []
        for _ in range(levels):
            for _ in range(cps):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            skips.append(x)
            x = pool_pack(x)
        for _ in range(cps):
            x = packed_conv_relu(x, conv_i)
            conv_i += 1
        x = unpack_volume(x)

        for lev in reversed(range(levels)):
            kT = params[f"ConvTranspose_{levels - 1 - lev}"]
            Kt = kT["kernel"].astype(jnp.float32)
            bT = kT["bias"].astype(jnp.float32)
            cu = Kt.shape[-1]
            cc = Kt.shape[-2]
            skip = skips[lev]
            cs = skip.shape[-1] // 8
            w_conv = params[f"Conv_{conv_i}"]["kernel"].astype(jnp.float32)
            b_conv = params[f"Conv_{conv_i}"]["bias"].astype(jnp.float32)
            wp = pack_weight_d1(w_conv)
            co8 = wp.shape[-1]
            wp = wp.reshape(2, 2, 2, 8, cs + cu, co8)
            w_skip = wp[..., :cs, :].reshape(2, 2, 2, 8 * cs, co8)
            w_up = wp[..., cs:, :]
            k_par = convT_packed_weight(Kt).reshape(cc, 8, cu)
            w_up_eff = jnp.einsum("cau,zyxauo->zyxco", k_par, w_up)
            b_fold = jnp.tile(b_conv, 8) + jnp.einsum(
                "u,zyxauo->o", bT, w_up)
            sizes = [2 * x.shape[i] for i in (1, 2, 3)]
            starts = [skip.shape[i] - x.shape[i] for i in (1, 2, 3)]
            sc = crop_packed(skip, starts, sizes)
            if mode == "prod":
                w_fold = jnp.concatenate([w_skip, w_up_eff], axis=3)
                xin = jnp.concatenate([sc, x.astype(dt)], axis=-1)
                y = lax.conv_general_dilated(
                    xin, w_fold.astype(dt), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + b_fold.astype(dt)
            else:
                if mode == "split_bar":
                    sc = lax.optimization_barrier(sc)
                ys = lax.conv_general_dilated(
                    sc, w_skip.astype(dt), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                yu = lax.conv_general_dilated(
                    x.astype(dt), w_up_eff.astype(dt), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                y = ys + yu + b_fold.astype(dt)
            x = jax.nn.relu(y)
            conv_i += 1
            for _ in range(cps - 1):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            if lev > 0:
                x = unpack_volume(x)

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


def main():
    rng = np.random.default_rng(0)
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm: PackedUNet = pspec.module
    tin = pspec.valid_size(96 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    params = variables["params"]
    B = 2
    tiles = jnp.asarray(rng.integers(0, 255, (B, tin, tin, tin)), jnp.uint8)
    tout = tin - 2 * pspec.context
    out_vox = B * tout ** 3
    print(f"tin={tin} tout={tout} B={B}", flush=True)

    # value check vs production first (cheap shapes reuse the jit cache? no
    # — same shapes; run once and compare)
    ref = None
    rows = []
    open("experiments/unet_fold_split.jsonl", "w").close()
    for mode in ["prod", "split", "split_bar"]:
        fn = make_forward(pm, params, mode)
        out = np.asarray(jax.jit(fn)(tiles), np.float32)
        if ref is None:
            ref = out
            maxdiff = 0.0
        else:
            maxdiff = float(np.max(np.abs(out - ref)))
        dtm = timeit(fn, (tiles,))
        row = {"mode": mode, "ms": round(dtm * 1e3, 2),
               "mvox_s": round(out_vox / dtm / 1e6, 1),
               "max_abs_diff_vs_prod": maxdiff}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/unet_fold_split.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
