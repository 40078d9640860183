"""Full packed U-Net forward at tin 388 with decoder/logits knobs.

After the pool_pack fix (pool_probe.jsonl) the remaining line items of
unet_prefix2.jsonl are dec0_fold (74.7 ms at 52.9 TF/s) and the logits
stage (36 ms, ~60 GB/s — far under HBM BW).  Hypotheses:

  bar_xin   : the decoder concat (8Cs + Cc channels) fuses into the
              fold conv's input — the same fuse-relayout-into-conv
              pathology that cost 6x on the ConvStack (chain_fix) —
              an optimization_barrier on xin forces a clean buffer.
  logits_bd : the logits stage's (..., 8, 24) reshape puts 24 lanes
              minor (pad-hostile).  Equivalent block-diagonal (192,8)
              dot: y[..., p] = x[..., p*24:(p+1)*24] @ w0 == x @ W_bd
              with W_bd[g*24+c, p] = w0[c] * (g == p).  8x the (tiny)
              FLOPs, lane-clean, still split-weight bf16 exact.
  barriers  : the existing PackedUNet(barriers=True) knob (barrier
              after pack/pool/unpack relayouts), re-tested at the
              covering-tile shape (was no-effect at t96b2).

python experiments/unet_fold_probe.py
"""

from __future__ import annotations

import functools
import itertools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import pack_volume_iv, pack_weight_d1, unpack_volume_iv
from flypylib_tpu.ops.packed_unet import (
    PackedUNet,
    convT_packed_weight,
    crop_packed,
    packed_unet_spec,
    pool_pack,
)
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
        t0 = time.perf_counter()
        float(many(args, n=iters))
        tn = time.perf_counter() - t0
        best = min(best, tn / iters)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm: PackedUNet = pspec.module
    inner = pm.inner
    tin = 388
    variables = spec.init(jax.random.PRNGKey(0), pspec.min_size)
    params = variables["params"]
    dt = pm.dtype
    tiles = jnp.asarray(rng.integers(0, 255, (1, tin, tin, tin)), jnp.uint8)
    tout = tin - 2 * pspec.context
    out_vox = tout ** 3
    cps = inner.convs_per_stage
    levels = inner.levels

    def forward(bar_xin=False, logits_bd=False, barriers=False):
        bar = lax.optimization_barrier if barriers else (lambda v: v)
        barx = lax.optimization_barrier if bar_xin else (lambda v: v)

        def packed_conv_relu(x, i):
            w = pack_weight_d1(params[f"Conv_{i}"]["kernel"].astype(dt))
            b = params[f"Conv_{i}"]["bias"].astype(dt)
            y = lax.conv_general_dilated(
                x, w, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ) + jnp.tile(b, 8)
            return jax.nn.relu(y)

        def f(tiles):
            x = (tiles.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            conv_i = 0
            x = bar(pack_volume_iv(x.astype(dt)))
            skips = []
            for _ in range(levels):
                for _ in range(cps):
                    x = packed_conv_relu(x, conv_i)
                    conv_i += 1
                skips.append(x)
                x = bar(pool_pack(x))
            for _ in range(cps):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            x = bar(unpack_volume_iv(x))
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
                xin = barx(jnp.concatenate([sc, x.astype(dt)], axis=-1))
                y = lax.conv_general_dilated(
                    xin, w_fold.astype(dt), (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) + b_fold.astype(dt)
                x = jax.nn.relu(y)
                conv_i += 1
                for _ in range(cps - 1):
                    x = packed_conv_relu(x, conv_i)
                    conv_i += 1
                if lev > 0:
                    x = bar(unpack_volume_iv(x))
            wl = params[f"Conv_{conv_i}"]["kernel"].astype(jnp.float32)
            bl = params[f"Conv_{conv_i}"]["bias"].astype(jnp.float32)
            w0 = wl[0, 0, 0]  # (C, 1)
            b_, d, h, w_sp, c8 = x.shape
            c = c8 // 8
            if logits_bd:
                eye = jnp.eye(8, dtype=jnp.float32)
                w_bd = jnp.einsum("c,gp->gcp", w0[:, 0], eye).reshape(
                    c8, 8)
                w_hi = w_bd.astype(dt)
                w_lo = (w_bd - w_hi.astype(jnp.float32)).astype(dt)
                wcat = jnp.concatenate([w_hi, w_lo], axis=-1)  # (c8, 16)
                y = jax.lax.dot_general(
                    x, wcat, (((4,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = y[..., :8] + y[..., 8:] + bl
            else:
                w_hi = w0.astype(dt)
                w_lo = (w0 - w_hi.astype(jnp.float32)).astype(dt)
                wcat = jnp.concatenate([w_hi, w_lo], axis=-1)
                xg = x.reshape(b_, d, h, w_sp, 8, c)
                y = jax.lax.dot_general(
                    xg, wcat, (((5,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = y[..., 0] + y[..., 1] + bl
            return unpack_volume_iv(y.reshape(b_, d, h, w_sp, 8))

        return f

    # correctness: logits_bd must match the production form exactly on
    # a small tile (both accumulate the same products in f32)
    ms = int(np.max(pspec.min_size))
    small = jnp.asarray(
        rng.integers(0, 255, (1, ms, ms, ms)), jnp.uint8
    )
    ref = np.asarray(forward()(small))
    got = np.asarray(forward(logits_bd=True)(small))
    assert ref.shape == got.shape
    err = np.max(np.abs(ref - got))
    print(f"logits_bd max err {err:.3e}", flush=True)
    # not bitwise: the 192-wide dot's MXU partial sums chunk differently
    # than the 24-wide form (measured 3.7e-9 — pure f32 accumulation
    # order on identical products); same class as the two-phase
    # executable split (BENCH_NOTES round 3)
    assert err < 1e-6, "block-diagonal logits beyond rounding"

    variants = [
        ("prod", {}),
        ("bar_xin", {"bar_xin": True}),
        ("logits_bd", {"logits_bd": True}),
        ("bar_xin+logits_bd", {"bar_xin": True, "logits_bd": True}),
        ("barriers", {"barriers": True}),
    ]
    open("experiments/unet_fold_probe.jsonl", "w").close()
    for name, kw in variants:
        dtm = timeit(forward(**kw), (tiles,))
        row = {
            "variant": name,
            "ms": round(dtm * 1e3, 2),
            "tile_mvox_s": round(out_vox / dtm / 1e6, 1),
        }
        print(json.dumps(row), flush=True)
        with open("experiments/unet_fold_probe.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
