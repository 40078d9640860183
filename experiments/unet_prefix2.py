"""Cumulative-prefix timing of the CURRENT packed U-Net forward.

unet_prefix.py profiled the round-3 engine (one-shot pack_volume
transposes, pool via pack_volume(parity_group_max)) at tile 128 b2.
This mirrors the production engine of today — pack_volume_iv /
unpack_volume_iv, pool_pack strided slices, fused decoder — at the
1k^3 shared-grid operating point (tin 388, b1, uint8 tiles) and
attributes per-stage deltas plus analytic conv FLOPs, so we can see
which stages sit below the MXU roofline and which are bandwidth.

python experiments/unet_prefix2.py
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
from flypylib_tpu.ops.packed_conv import pack_weight_d1
from flypylib_tpu.ops.packed_unet import (
    PackedUNet,
    convT_packed_weight,
    crop_packed,
    packed_unet_spec,
    pool_pack,
)
from flypylib_tpu.ops.packed_conv import pack_volume_iv, unpack_volume_iv
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


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm: PackedUNet = pspec.module
    inner = pm.inner
    B = 1
    tin = 388  # the 1k^3 shared-grid tile (BENCH_NOTES round 4)
    variables = spec.init(jax.random.PRNGKey(0), pspec.min_size)
    params = variables["params"]
    dt = pm.dtype
    tiles = jnp.asarray(
        rng.integers(0, 255, (B, tin, tin, tin)), jnp.uint8
    )
    tout = tin - 2 * pspec.context
    out_vox = B * tout ** 3
    cps = inner.convs_per_stage
    levels = inner.levels

    # conv FLOPs per stop point, filled by a traced dry pass
    flops: dict[str, float] = {}

    def forward_prefix(upto, record=None):
        def f(tiles):
            x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            state = {"steps": 0, "flops": 0.0}

            def conv_flops(xin, w):
                n_out = (
                    xin.shape[0]
                    * (xin.shape[1] - w.shape[0] + 1)
                    * (xin.shape[2] - w.shape[1] + 1)
                    * (xin.shape[3] - w.shape[2] + 1)
                )
                state["flops"] += (
                    2.0 * n_out * w.shape[0] * w.shape[1] * w.shape[2]
                    * w.shape[3] * w.shape[4]
                )

            def step(name):
                state["steps"] += 1
                if record is not None and state["steps"] == upto:
                    record[name] = state["flops"]
                return state["steps"] >= upto

            conv_i = 0

            def packed_conv_relu(x, i):
                w = pack_weight_d1(params[f"Conv_{i}"]["kernel"].astype(dt))
                b = params[f"Conv_{i}"]["bias"].astype(dt)
                conv_flops(x, w)
                y = lax.conv_general_dilated(
                    x, w, (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + jnp.tile(b, 8)
                return jax.nn.relu(y)

            x = pack_volume_iv(x.astype(dt))
            if step("pack"):
                return x
            skips = []
            for lev in range(levels):
                for _ in range(cps):
                    x = packed_conv_relu(x, conv_i)
                    conv_i += 1
                if step(f"enc{lev}"):
                    return x
                skips.append(x)
                x = pool_pack(x)
                if step(f"pool{lev}"):
                    return x
            for _ in range(cps):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            if step("bottleneck"):
                return x
            x = unpack_volume_iv(x)
            if step("unpackB"):
                return x
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
                conv_flops(xin, w_fold)
                y = lax.conv_general_dilated(
                    xin, w_fold.astype(dt), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + b_fold.astype(dt)
                x = jax.nn.relu(y)
                conv_i += 1
                if step(f"dec{lev}_fold"):
                    return x
                for _ in range(cps - 1):
                    x = packed_conv_relu(x, conv_i)
                    conv_i += 1
                if step(f"dec{lev}_convs"):
                    return x
                if lev > 0:
                    x = unpack_volume_iv(x)
                    if step(f"dec{lev}_unpack"):
                        return x
            wl = params[f"Conv_{conv_i}"]["kernel"].astype(jnp.float32)
            bl = params[f"Conv_{conv_i}"]["bias"].astype(jnp.float32)
            w0 = wl[0, 0, 0]
            w_hi = w0.astype(dt)
            w_lo = (w0 - w_hi.astype(jnp.float32)).astype(dt)
            wcat = jnp.concatenate([w_hi, w_lo], axis=-1)
            b_, d, h, w_sp, c8 = x.shape
            state["flops"] += 2.0 * b_ * d * h * w_sp * c8 * 2
            xg = x.reshape(b_, d, h, w_sp, 8, c8 // 8)
            y = jax.lax.dot_general(
                xg, wcat, (((5,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y[..., 0] + y[..., 1] + bl
            out = unpack_volume_iv(y.reshape(b_, d, h, w_sp, 8))
            if record is not None:
                record["logits"] = state["flops"]
            return out

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

    # analytic FLOPs per prefix via one abstract trace per stop point
    for k, name in enumerate(names, start=1):
        rec: dict[str, float] = {}
        jax.eval_shape(forward_prefix(k, record=rec), tiles)
        flops.update(rec)

    open("experiments/unet_prefix2.jsonl", "w").close()
    prev_t, prev_f = 0.0, 0.0
    for k, name in enumerate(names, start=1):
        dtm = timeit(forward_prefix(k), (tiles,))
        fl = flops.get(name, prev_f)
        row = {
            "prefix": name,
            "cum_ms": round(dtm * 1e3, 2),
            "delta_ms": round((dtm - prev_t) * 1e3, 2),
            "delta_tflop_s": round(
                (fl - prev_f) / max(dtm - prev_t, 1e-9) / 1e12, 1
            ),
            "cum_mvox_s": round(out_vox / dtm / 1e6, 1),
        }
        prev_t, prev_f = dtm, fl
        print(json.dumps(row), flush=True)
        with open("experiments/unet_prefix2.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
