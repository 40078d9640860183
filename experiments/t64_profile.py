"""Per-stage profile of the packed forward at the PRODUCTION tile shape
(tile_out=64, tile_batch=16 — the round-2 default), plus the in-graph
overhead ops (tile gather / output scatter) and candidate optimizations:

- scatter via block-transpose (tiles on a regular output grid assemble
  with ONE dynamic_update_slice instead of a 16-step scan);
- logits layer in bf16 inputs + f32 accumulation (the f32 upcast of the
  96-channel head activation is pure HBM bandwidth);
- a fully chained fwd_slab equivalent, to separate in-graph time from
  dispatch overhead.

All timings chain iterations inside one lax.scan dispatch and take the
min over repeats (tunnel jitter is heavy-tailed).

python experiments/t64_profile.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.ops.packed_conv import (
    pack_volume, pack_weight_d1, parity_merge,
)


def scan_time(f, args, iters=8, reps=3):
    """min over reps of ((time of n=iters) - (time of n=1)) / (iters-1).

    Only float-dtype first args are perturbed to defeat CSE."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            if jnp.issubdtype(args[0].dtype, jnp.floating):
                first = args[0] + i.astype(args[0].dtype) * 1e-7
            else:
                first = args[0]
            out = f(first, *args[1:])
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
    return max(best, 1e-9)


def conv(x, w, pref=None):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=pref,
    )


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    rows = []

    def rec(name, dt, dense_flops=None, out_vox=None):
        row = {"name": name, "ms": round(dt * 1e3, 3)}
        if dense_flops:
            row["tflops_dense_eq"] = round(dense_flops / dt / 1e12, 1)
        if out_vox:
            row["mvox_s"] = round(out_vox / dt / 1e6, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/t64_profile.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    def arr(shape, dtype=bf):
        return jnp.asarray(rng.normal(size=shape), dtype)

    def wc(k, ci, co, dtype=bf):
        return jnp.asarray(
            rng.normal(size=(k, k, k, ci, co)) * 0.05, dtype
        )

    open("experiments/t64_profile.jsonl", "w").close()

    # ---- production t64b16 shapes (dense out = 16 x 64^3 per batch) ----
    OUT = 16 * 64**3
    fl_l2 = 27 * 24 * 32 * 2
    fl_l3 = 27 * 32 * 48 * 2
    fl_l4 = 27 * 48 * 64 * 2
    fl_head = 64 * 96 * 2
    fl_log = 96 * 1 * 2

    # tile gather: 16 x 76^3 u8 tiles from one slab + f32 cast
    slab_u8 = jnp.asarray(
        rng.integers(0, 255, (76, 336, 336)), jnp.uint8
    )
    corners = jnp.asarray(
        [(0, 64 * (i // 4), 64 * (i % 4)) for i in range(16)], jnp.int32)

    def gather(s, cs):
        t = jax.vmap(
            lambda c: lax.dynamic_slice(
                s, (c[0], c[1], c[2]), (76, 76, 76)))(cs)
        return t.astype(jnp.float32) * (1.0 / 255.0)

    rec("gather16_u8_cast", scan_time(lambda s: gather(s, corners),
                                      (slab_u8,)), out_vox=OUT)

    # output scatter: 16-step scan of dynamic_update_slice (current)
    out0 = jnp.zeros((256, 336, 336), jnp.float32)
    tiles = arr((16, 64, 64, 64), jnp.float32)

    def scatter_scan(t, o, cs):
        def body(o, a):
            tile, c = a
            return lax.dynamic_update_slice(
                o, tile, (c[0], c[1], c[2])), None
        o, _ = lax.scan(body, o, (t, cs))
        return o

    rec("scatter16_scan", scan_time(scatter_scan, (tiles, out0, corners)),
        out_vox=OUT)

    # output scatter: regular-grid tiles assemble by transpose + ONE DUS
    def scatter_block(t, o):
        blk = t.reshape(4, 4, 64, 64, 64)
        blk = blk.transpose(2, 0, 3, 1, 4).reshape(64, 256, 256)
        return lax.dynamic_update_slice(o, blk, (0, 0, 0))

    rec("scatter16_block", scan_time(scatter_block, (tiles, out0)),
        out_vox=OUT)

    # L3 re-measure (previous run caught a tunnel stall)
    xd = arr((128, 36, 36, 36, 32))
    w3 = wc(3, 32, 48)
    rec("L3_t64b16", scan_time(lambda x, w: conv(x, w), (xd, w3)),
        fl_l3 * OUT, OUT)
    xe = arr((128, 34, 34, 34, 48))
    w4 = wc(3, 48, 64)
    rec("L4_t64b16", scan_time(lambda x, w: conv(x, w), (xe, w4)),
        fl_l4 * OUT, OUT)

    # logits: current (f32 in / f32 weights) vs bf16 in + f32 accum
    xg32 = arr((128, 32, 32, 32, 96), jnp.float32)
    wl32 = wc(1, 96, 1, jnp.float32)
    rec("logits_f32", scan_time(lambda x, w: conv(x, w), (xg32, wl32)),
        fl_log * OUT, OUT)
    xg16 = arr((128, 32, 32, 32, 96), bf)
    wl16 = wc(1, 96, 1, bf)
    rec("logits_bf16_accf32", scan_time(
        lambda x, w: conv(x, w, jnp.float32), (xg16, wl16)),
        fl_log * OUT, OUT)

    # head+logits as reshaped matmuls (skip conv machinery for 1x1x1)
    xf = arr((128, 32, 32, 32, 64))
    wh2 = arr((64, 96))
    wl2 = arr((96, 1), jnp.float32)

    def head_logits_mm(x, wh, wl):
        m = x.reshape(-1, 64)
        h = jax.nn.relu(jnp.dot(m, wh))
        return jnp.dot(h.astype(jnp.float32), wl).reshape(
            128, 32, 32, 32, 1)

    rec("head+logits_matmul", scan_time(head_logits_mm, (xf, wh2, wl2)),
        (fl_head + fl_log) * OUT, OUT)

    wh3 = wc(1, 64, 96)
    rec("head_conv", scan_time(lambda x, w: conv(x, w), (xf, wh3)),
        fl_head * OUT, OUT)

    # ---- full chained fwd_slab equivalent: one slab -> 16 tiles ->
    # packed forward -> scatter, all inside the timed scan ----
    w1p = pack_weight_d1(wc(3, 1, 24))
    w2p = pack_weight_d1(wc(3, 24, 32))
    b1 = arr((192,))
    b2 = arr((256,))
    b3 = arr((48,))
    b4 = arr((64,))
    bh = arr((96,))
    bl = arr((1,), jnp.float32)

    def full_fwd(s, cs, o):
        x = gather(s, cs)  # (16,76,76,76) f32
        x = pack_volume(x[..., None]).astype(bf)
        x = jax.nn.relu(conv(x, w1p) + b1)
        x = jax.nn.relu(conv(x, w2p) + b2)
        b0, d, h, w_, c8 = x.shape
        x = x.reshape(b0, d, h, w_, 8, c8 // 8)
        x = x.transpose(0, 4, 1, 2, 3, 5).reshape(b0 * 8, d, h, w_,
                                                  c8 // 8)
        x = jax.nn.relu(conv(x, w3) + b3)
        x = jax.nn.relu(conv(x, w4) + b4)
        x = jax.nn.relu(conv(x, wh3).astype(bf) + bh)
        x = conv(x.astype(jnp.float32), wl32) + bl
        x = parity_merge(x)  # (16, 64,64,64, 1)
        probs = jax.nn.sigmoid(x[..., 0])

        def body(o, a):
            tile, c = a
            return lax.dynamic_update_slice(
                o, tile, (c[0], c[1], c[2])), None
        o, _ = lax.scan(body, o, (probs, cs))
        return o

    rec("full_fwd_slab_chained",
        scan_time(lambda s: full_fwd(s, corners, out0), (slab_u8,)),
        out_vox=OUT)

    # ---- two-sweep stage-B candidates: bigger lattice tiles ----
    for lt, b in ((36, 128), (40, 64), (44, 64), (52, 32), (68, 16)):
        xs = arr((b, lt, lt, lt, 32))
        ov = b * (lt - 2) ** 3 * 8
        rec(f"L3_lat{lt}_b{b}", scan_time(
            lambda x, w: conv(x, w), (xs, w3)), fl_l3 * ov, ov)

    # stage-A L2 over a whole-ROI lattice slab (two-sweep sweep-A shape)
    for zl in (18, 38):
        xs = arr((1, zl, 142, 142, 192))
        ov = (zl - 1) * 141 * 141 * 8
        rec(f"L2_roi_slab_z{zl}", scan_time(
            lambda x, w: conv(x, w), (xs, w2p)), fl_l2 * ov, ov)


if __name__ == "__main__":
    main()
