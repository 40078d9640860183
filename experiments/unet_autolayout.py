"""Two-phase packed U-Net with AUTO output layouts (round 3, cont).

unet_twophase measured the bottleneck-unpack split at 270 ms
sum-of-phases vs 66.7 monolithic and attributed the loss to
materializing every skip tensor as an executable OUTPUT.  Hypothesis:
the cost is layout FORCING (outputs default to the row-major default
layout; XLA's conv activations live in a different internal layout, so
each skip pays a full relayout copy), not the HBM bytes (~340 MB at
bf16, < 1 ms of bandwidth).

Probe: same split, but phase_e is compiled with
``out_shardings=Format(Layout.AUTO)`` so XLA emits the skips in
whatever layout it already has, and phase_d specializes on the incoming
layouts (input layouts are part of the jit cache key).  If the
hypothesis holds, sum-of-phases should drop toward the monolithic
number — opening the door to an encoder-share two-pass U-Net engine
that eliminates the level-0/1 halo redundancy (~25% of total FLOPs at
t96).

python experiments/unet_autolayout.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.layout import Format, Layout

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import pack_volume, pack_weight_d1
from flypylib_tpu.ops.packed_unet import packed_unet_spec, pool_pack, unpack_volume


def timed(fn, args, iters=8, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[:1]
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(
            jax.device_get(jax.tree_util.tree_leaves(out)[-1])
        ).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm = pspec.module
    inner = pm.inner
    tin = pspec.valid_size(96 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    rng = np.random.default_rng(0)
    B = 2
    x = jnp.asarray(rng.random((B, tin, tin, tin, 1)), jnp.float32)
    vox = B * (tin - 2 * pspec.context) ** 3

    rows = []

    def rec(name, ms):
        row = {"name": name, "ms": round(ms * 1e3, 2),
               "mvox_s": round(vox / ms / 1e6, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    mono = jax.jit(lambda v, x: pm.apply(v, x, train=False))
    dt_mono, ref = timed(mono, (variables, x))
    rec("monolithic", dt_mono)

    cps = inner.convs_per_stage
    levels = inner.levels
    dt = pm.dtype

    def conv_relu(params, x, i):
        w = params[f"Conv_{i}"]["kernel"].astype(dt)
        b = params[f"Conv_{i}"]["bias"].astype(dt)
        y = lax.conv_general_dilated(
            x, pack_weight_d1(w), (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + jnp.tile(b, 8)
        return jax.nn.relu(y)

    def phase_e_body(variables, x):
        params = variables["params"]
        x = pack_volume(x.astype(dt))
        conv_i = 0
        skips = []
        for _ in range(levels):
            for _ in range(cps):
                x = conv_relu(params, x, conv_i)
                conv_i += 1
            skips.append(x)
            x = pool_pack(x)
        for _ in range(cps):
            x = conv_relu(params, x, conv_i)
            conv_i += 1
        return unpack_volume(x), skips

    # decoder (same as unet_twophase; equality re-checked against mono)
    from flypylib_tpu.ops.packed_unet import convT_packed_weight, crop_packed

    def _decoder(variables, x, skips):
        params = variables["params"]
        conv_i = levels * cps + cps
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
            w_fold = jnp.concatenate([w_skip, w_up_eff], axis=3)
            b_fold = jnp.tile(b_conv, 8) + jnp.einsum(
                "u,zyxauo->o", bT, w_up
            )
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
            for _ in range(cps - 1):
                x = conv_relu(params, x, conv_i)
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
        y = lax.dot_general(
            xg, wcat, (((5,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y[..., 0] + y[..., 1] + bl
        return unpack_volume(y.reshape(b_, d, h, w_sp, 8))

    # ---- variant A: default layouts (unet_twophase reproduction) -------
    phase_e_def = jax.jit(phase_e_body)
    phase_d_def = jax.jit(_decoder)
    xd, skips = phase_e_def(variables, x)
    two = phase_d_def(variables, xd, skips)
    np.testing.assert_allclose(
        np.asarray(two), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
    dt_e, _ = timed(phase_e_def, (variables, x))
    rec("phase_e default-layout", dt_e)
    dt_d, _ = timed(phase_d_def, (variables, xd, skips))
    rec("phase_d default-layout", dt_d)
    rec("sum default-layout", dt_e + dt_d)

    # ---- variant B: AUTO output layouts on phase_e ---------------------
    try:
        auto = Format(Layout.AUTO)
        phase_e_auto = jax.jit(phase_e_body, out_shardings=auto)
        xd2, skips2 = phase_e_auto(variables, x)
        print("skip formats:", [a.format for a in skips2], flush=True)
        phase_d_auto = jax.jit(_decoder)  # specializes on input layouts
        two2 = phase_d_auto(variables, xd2, skips2)
        np.testing.assert_allclose(
            np.asarray(two2), np.asarray(ref), rtol=1e-5, atol=1e-6
        )
        dt_e2, _ = timed(phase_e_auto, (variables, x))
        rec("phase_e AUTO-layout", dt_e2)
        dt_d2, _ = timed(phase_d_auto, (variables, xd2, skips2))
        rec("phase_d AUTO-layout", dt_d2)
        rec("sum AUTO-layout", dt_e2 + dt_d2)
    except Exception as e:  # noqa: BLE001 — record and continue
        row = {"name": "AUTO-layout", "error": str(e)[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("experiments/unet_autolayout.jsonl", "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
