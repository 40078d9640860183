"""Dispatch-boundary split of the packed U-Net at the dec0 concat (round 6).

unet_prefix2 attributes dec0_fold 74.7 ms in-chain while the SAME conv
runs 47.1 ms standalone (dec0_probe prod240) — the same shape of story
as the ConvStack's post-parity-split conv, which only ran full speed
across a jit boundary (chain_fix3 -> the production two-phase slab
forward).  dec0_retile killed the batched-block alternative (enc0
blocks run at mono rate; dec0 block shapes compile pathologically), so
the dispatch split is the remaining lever.

Variants at the bench operating point (tin 388, tout 348, batch 1):

  mono       production single-jit forward (anchor)
  split_cat  phase A = pack..dec1..unpack + crop skip0 + CONCAT
             (returns xin (1,176^3,240) bf16, 2.6 GB); phase B = dec0
             fold conv + conv + logits + unpack
  split_two  phase A returns (sc, x) separately; phase B concats —
             probes whether the concat itself must cross the boundary

Outputs are checked identical to mono (same ops, same order).

python experiments/unet_split_dec0.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("SPLIT_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import pack_weight_d1
from flypylib_tpu.ops.packed_unet import (
    PackedUNet,
    _conv2,
    convT_packed_weight,
    crop_packed,
    pool_pack,
)
from flypylib_tpu.ops.packed_conv import pack_volume_iv, unpack_volume_iv
from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "experiments/unet_split_dec0.jsonl"
TIN = int(os.environ.get("SPLIT_TIN", "388"))


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only is None:
        open(OUT, "w").close()

    spec = unet()  # eval config 4
    module = PackedUNet(spec.module)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    small = spec.min_size + 0
    variables = spec.module.init(
        key, jnp.zeros((1, small, small, small, 1), jnp.float32), train=False
    )
    params = jax.tree.map(jnp.asarray, variables["params"])
    dt = jnp.bfloat16
    cps = spec.module.convs_per_stage
    levels = spec.module.levels
    assert levels == 2 and cps == 2

    def packed_conv_relu(x, i):
        w = params[f"Conv_{i}"]["kernel"].astype(dt)
        b = params[f"Conv_{i}"]["bias"].astype(dt)
        return jax.nn.relu(_conv2(x, pack_weight_d1(w)) + jnp.tile(b, 8))

    def fold_weights(lev, conv_i):
        kT = params[f"ConvTranspose_{levels - 1 - lev}"]
        Kt = kT["kernel"].astype(jnp.float32)
        bT = kT["bias"].astype(jnp.float32)
        cu = Kt.shape[-1]
        cc = Kt.shape[-2]
        w_conv = params[f"Conv_{conv_i}"]["kernel"].astype(jnp.float32)
        b_conv = params[f"Conv_{conv_i}"]["bias"].astype(jnp.float32)
        wp = pack_weight_d1(w_conv)
        co8 = wp.shape[-1]
        cs = (wp.shape[3] - 8 * cu) // 8
        wp = wp.reshape(2, 2, 2, 8, cs + cu, co8)
        w_skip = wp[..., :cs, :].reshape(2, 2, 2, 8 * cs, co8)
        w_up = wp[..., cs:, :]
        k_par = convT_packed_weight(Kt).reshape(cc, 8, cu)
        w_up_eff = jnp.einsum("cau,zyxauo->zyxco", k_par, w_up)
        w_fold = jnp.concatenate([w_skip, w_up_eff], axis=3)
        b_fold = jnp.tile(b_conv, 8) + jnp.einsum("u,zyxauo->o", bT, w_up)
        return w_fold.astype(dt), b_fold.astype(dt)

    def logits_dot(x):
        conv_i = 10
        wl = params[f"Conv_{conv_i}"]["kernel"].astype(jnp.float32)
        bl = params[f"Conv_{conv_i}"]["bias"].astype(jnp.float32)
        w0 = wl[0, 0, 0]
        b_, d, h, w_sp, c8 = x.shape
        eye = jnp.eye(8, dtype=jnp.float32)
        w_bd = jnp.einsum("c,gp->gcp", w0[:, 0], eye).reshape(c8, 8)
        w_hi = w_bd.astype(dt)
        w_lo = (w_bd - w_hi.astype(jnp.float32)).astype(dt)
        wcat = jnp.concatenate([w_hi, w_lo], axis=-1)
        y = lax.dot_general(
            x, wcat, (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y[..., :8] + y[..., 8:] + bl
        return unpack_volume_iv(y.reshape(b_, d, h, w_sp, 8))

    def phase_a(x):
        """pack .. encoders .. bottleneck .. dec1 .. (sc, x_dense)."""
        x = pack_volume_iv(x.astype(dt))
        skips = []
        conv_i = 0
        for _ in range(levels):
            for _ in range(cps):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            skips.append(x)
            x = pool_pack(x)
        for _ in range(cps):
            x = packed_conv_relu(x, conv_i)
            conv_i += 1
        x = unpack_volume_iv(x)
        # decoder lev 1
        lev = 1
        w_fold, b_fold = fold_weights(lev, conv_i)
        skip = skips[lev]
        sizes = [2 * x.shape[i] for i in (1, 2, 3)]
        starts = [skip.shape[i] - x.shape[i] for i in (1, 2, 3)]
        sc = crop_packed(skip, starts, sizes)
        xin = jnp.concatenate([sc, x.astype(dt)], axis=-1)
        x = jax.nn.relu(_conv2(xin, w_fold) + b_fold)
        conv_i += 1
        for _ in range(cps - 1):
            x = packed_conv_relu(x, conv_i)
            conv_i += 1
        x = unpack_volume_iv(x)
        # dec0 inputs
        lev = 0
        skip = skips[lev]
        sizes = [2 * x.shape[i] for i in (1, 2, 3)]
        starts = [skip.shape[i] - x.shape[i] for i in (1, 2, 3)]
        sc = crop_packed(skip, starts, sizes)
        return sc, x.astype(dt)

    def phase_b_core(xin):
        conv_i = 8
        w_fold, b_fold = fold_weights(0, conv_i)
        x = jax.nn.relu(_conv2(xin, w_fold) + b_fold)
        conv_i += 1
        for _ in range(cps - 1):
            x = packed_conv_relu(x, conv_i)
            conv_i += 1
        return logits_dot(x)

    def phase_b_blocks(xin):
        """dec0 tail on a regular 6^3 grid of 31^3-in / 29^3-out blocks
        (dec0_retile: 140.5 TF/s vs 78.7 monolithic), stitched with the
        conv-stack's block transpose."""
        dpack = xin.shape[1]
        bc = 29 if (dpack - 2) % 29 == 0 else (dpack - 2) // 2
        g = (dpack - 2) // bc  # 6 at tin 388 (bc=29)
        assert g * bc + 2 == dpack
        bi, bo = bc + 2, 2 * bc
        # slice overlap-2 windows per axis, batching as we go
        blk = xin[0]
        parts = []
        for bz in range(g):
            parts.append(lax.slice_in_dim(blk, bz * bc, bz * bc + bi, axis=0))
        blk = jnp.stack(parts)  # (g, 31, 176, 176, C)
        parts = []
        for by in range(g):
            parts.append(lax.slice_in_dim(blk, by * bc, by * bc + bi, axis=2))
        blk = jnp.stack(parts, axis=1)  # (g, g, 31, 31, 176, C)
        parts = []
        for bx in range(g):
            parts.append(lax.slice_in_dim(blk, bx * bc, bx * bc + bi, axis=4))
        blk = jnp.stack(parts, axis=2)  # (g, g, g, 31, 31, 31, C)
        blk = blk.reshape(g * g * g, bi, bi, bi, xin.shape[-1])

        conv_i = 8
        w_fold, b_fold = fold_weights(0, conv_i)
        x = jax.nn.relu(_conv2(blk, w_fold) + b_fold)
        conv_i += 1
        for _ in range(cps - 1):
            x = packed_conv_relu(x, conv_i)
            conv_i += 1
        probs = logits_dot(x)  # (g^3, bo, bo, bo)
        probs = probs.reshape(g, g, g, bo, bo, bo)
        probs = probs.transpose(0, 3, 1, 4, 2, 5)
        return probs.reshape(1, g * bo, g * bo, g * bo)

    jit_mono = jax.jit(
        lambda x: jnp.sum(
            jax.nn.sigmoid(module.apply(variables, x, train=False))
        )
    )
    jit_a_cat = jax.jit(
        lambda x: jnp.concatenate(phase_a(x), axis=-1)
    )
    jit_b_cat = jax.jit(
        lambda xin: jnp.sum(jax.nn.sigmoid(phase_b_core(xin)))
    )
    jit_a_two = jax.jit(phase_a)
    jit_b_two = jax.jit(
        lambda sc, xd: jnp.sum(
            jax.nn.sigmoid(
                phase_b_core(jnp.concatenate([sc, xd], axis=-1))
            )
        )
    )

    x_np = rng.standard_normal((1, TIN, TIN, TIN, 1)).astype(np.float32)
    x = jax.device_put(x_np)

    def bench(name, step, iters=6, reps=3):
        try:
            float(step(x))  # compile + run once
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                outs = [step(x) for _ in range(iters)]
                # forced value transfers (tunnel: block_until_ready lies)
                _ = [float(o) for o in outs]
                dtm = (time.perf_counter() - t0) / iters
                best = min(best, dtm)
        except Exception as e:  # noqa: BLE001
            emit({"variant": name, "error": str(e)[:200]})
            return None
        vox = (TIN - 2 * spec.context) ** 3
        emit({
            "variant": name,
            "ms": round(best * 1e3, 2),
            "mvox_s": round(vox / best / 1e6, 1),
        })
        return best

    def want(n):
        return only is None or only == n

    ref = None
    if want("mono"):
        ref = float(jit_mono(x))
        bench("mono", jit_mono)

    if want("split_cat"):
        v = float(jit_b_cat(jit_a_cat(x)))
        if ref is not None:
            emit({"check": "split_cat", "mono": ref, "split": v,
                  "match": bool(abs(v - ref) < 1e-3 * max(1.0, abs(ref)))})
        bench("split_cat", lambda x: jit_b_cat(jit_a_cat(x)))

    if want("split_two"):
        v = float(jit_b_two(*jit_a_two(x)))
        if ref is not None:
            emit({"check": "split_two", "mono": ref, "split": v,
                  "match": bool(abs(v - ref) < 1e-3 * max(1.0, abs(ref)))})
        bench("split_two", lambda x: jit_b_two(*jit_a_two(x)))

    if want("split_b29"):
        jit_b_blk = jax.jit(
            lambda xin: jnp.sum(jax.nn.sigmoid(phase_b_blocks(xin)))
        )
        v = float(jit_b_blk(jit_a_cat(x)))
        if ref is not None:
            emit({"check": "split_b29", "mono": ref, "split": v,
                  "match": bool(abs(v - ref) < 1e-3 * max(1.0, abs(ref)))})
        bench("split_b29", lambda x: jit_b_blk(jit_a_cat(x)))


if __name__ == "__main__":
    main()
