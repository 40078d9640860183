"""Decoder fold WITHOUT the concat: conv(concat(a,b),W) == conv(a,Wa)+conv(b,Wb).

The packed U-Net's per-level fold materializes ``jnp.concatenate([sc, x])``
(a full-res-size copy of skip + up tensors) before the fold conv.  The
split-conv form trades that copy for a second conv dispatch over the same
FLOPs; whether XLA already fuses the concat away is an empirical question
(the chain is conv-bound per unet_profile3, so expect small effect).

Timing at the bench shape (192^3 input, t96b2-equivalent single tile
batch 2), plus max-abs diff vs the production forward.

python experiments/unet_noconcat.py
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

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import pack_volume, pack_weight_d1, unpack_volume
from flypylib_tpu.ops.packed_unet import (
    PackedUNet,
    convT_packed_weight,
    crop_packed,
    packed_unet_spec,
    pool_pack,
    _conv2,
)


def forward_noconcat(pm: PackedUNet, variables, x):
    inner = pm.inner
    params = variables["params"]
    dt = pm.dtype
    cps = inner.convs_per_stage
    levels = inner.levels
    conv_i = 0

    def packed_conv_relu(x, i):
        w = params[f"Conv_{i}"]["kernel"].astype(dt)
        b = params[f"Conv_{i}"]["bias"].astype(dt)
        y = _conv2(x, pack_weight_d1(w)) + jnp.tile(b, 8)
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
        b_fold = jnp.tile(b_conv, 8) + jnp.einsum("u,zyxauo->o", bT, w_up)

        sizes = [2 * x.shape[i] for i in (1, 2, 3)]
        starts = [skip.shape[i] - x.shape[i] for i in (1, 2, 3)]
        sc = crop_packed(skip, starts, sizes)

        # split conv: no concat materialization
        y = (
            _conv2(sc, w_skip.astype(dt))
            + _conv2(x.astype(dt), w_up_eff.astype(dt))
            + b_fold.astype(dt)
        )
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
    y = lax.dot_general(
        xg, wcat, (((5,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y[..., 0] + y[..., 1] + bl
    return unpack_volume(y.reshape(b_, d, h, w_sp, 8 * 1))


def timed(fn, args, iters=5, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.device_get(out)).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm = pspec.module
    tile = pspec.valid_size(96)
    B = 2
    variables = spec.init(jax.random.PRNGKey(0), tile)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, tile, tile, tile, 1)), jnp.float32)

    base = jax.jit(lambda v, x: pm._forward(v, x))
    nocat = jax.jit(lambda v, x: forward_noconcat(pm, v, x))

    o1 = np.asarray(jax.device_get(base(variables, x)))
    o2 = np.asarray(jax.device_get(nocat(variables, x)))
    diff = float(np.abs(o1 - o2).max())

    out_vox = B * (o1.shape[1] * o1.shape[2] * o1.shape[3])
    rows = []
    for name, fn in [("base_concat", base), ("split_conv", nocat)]:
        dt = timed(fn, (variables, x))
        rows.append({
            "name": name, "tile": tile, "batch": B,
            "ms": round(dt * 1e3, 2),
            "mvox_s": round(out_vox / dt / 1e6, 1),
        })
    rows.append({"max_abs_diff": diff})
    with open("experiments/unet_noconcat.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
