"""Round-3 probes for the composed-forward gap (VERDICT r2 weak #2).

Round-2 state (experiments/fwd_structure.jsonl, 272^3 ROI, t64b16):
carry 132 ms, noscatter (convs only) 122 ms, parts-sum ~70 ms.  The gap
lives INSIDE the scanned conv chain.  Probes:

- ``carry``          production baseline, re-measured this session
- ``carry_unroll4``  inner tile-batch scan with unroll=4 (lets XLA
                     software-pipeline across batches)
- ``pregather_scat`` tile batches pre-extracted to a resident array
                     (no dynamic_slice gather in the loop), DUS scatter
- ``pregather_sum``  same minus the scatter (pure chain over scan)
- ``batch1_chain``   ONE tile batch, no scan at all — the chain at
                     exactly the shapes the per-layer parts were timed
                     at; if this matches the parts-sum rate, the loss is
                     scan-related, else it is inter-layer (layouts)

python experiments/fwd_structure2.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.infer.large import make_stream_plan, stage_volume
from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.packed_conv import packed_spec


def timeit(fn, args, iters=5, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            out = fn(*args, i)
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
    rows = []
    import sys as _sys

    if "--skip-carry" not in _sys.argv:
        open("experiments/fwd_structure2.jsonl", "w").close()

    def rec(name, dt, out_vox):
        row = {
            "name": name, "ms": round(dt * 1e3, 2),
            "mvox_s": round(out_vox / dt / 1e6, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/fwd_structure2.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    spec = baseline_model()
    pspec = packed_spec(spec)
    tin0 = pspec.valid_size(128 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin0)

    vol = rng.integers(0, 255, (256,) * 3).astype(np.uint8)
    plan = make_stream_plan(pspec, variables, vol.shape, core=256,
                            window=5, threshold=0.9)
    pipe = plan.pipe
    big, _ = stage_volume(vol, plan=plan)
    pad_hi = [max(0, pipe.padded_shape[d] - big.shape[d])
              for d in range(3)]
    big = jnp.pad(big, [(0, p) for p in pad_hi])
    out_vox = int(np.prod(pipe._out_shape))

    tin = pipe._tin
    _, py, px = pipe.padded_shape
    zs_arr = jnp.asarray([zs for zs, _ in pipe._slabs], jnp.int32)
    locals_arr = jnp.stack([local for _, local in pipe._slabs])
    S, nb, B, _ = locals_arr.shape
    mod = pipe.spec.module

    origins = jnp.zeros((4, 3), jnp.int32)
    for j, o in enumerate([(1, 0, 0), (0, 1, 0), (0, 0, 1)], start=1):
        origins = origins.at[j].set(jnp.asarray(o, jnp.int32))

    def batch_probs(slab, corner_batch):
        tiles = jax.vmap(
            lambda c: lax.dynamic_slice(
                slab, (c[0], c[1], c[2]), (tin, tin, tin))
        )(corner_batch)
        x = tiles.astype(jnp.float32) * (1.0 / 255.0)
        logits = mod.apply(variables, x[..., None], train=False)
        return jax.nn.sigmoid(logits[..., 0])

    def make_carry(unroll):
        def fwd(big, i):
            origin = origins[i % 4]
            out0 = jnp.zeros(pipe._out_shape, jnp.float32)

            def slab_body(out, args):
                zs, local = args
                slab = lax.dynamic_slice(
                    big, (origin[0] + zs, origin[1], origin[2]),
                    (tin, py, px))

                def body(out, cb):
                    probs = batch_probs(slab, cb)
                    return pipe._write_tiles(out, probs, cb, zs), None

                out, _ = lax.scan(body, out, local, unroll=unroll)
                return out, None

            out, _ = lax.scan(slab_body, out0, (zs_arr, locals_arr))
            return out

        return fwd

    import sys

    if "--skip-carry" not in sys.argv:
        rec("carry", timeit(make_carry(1), (big,)), out_vox)
        rec("carry_unroll4", timeit(make_carry(4), (big,)), out_vox)

    # pre-gathered tiles: (S*nb, B, tin, tin, tin) resident in HBM
    tiles_list = []
    corners = []
    big_host = np.asarray(jax.device_get(big))
    for si, (zs, local) in enumerate(pipe._slabs):
        local_np = np.asarray(local)
        for bi in range(nb):
            batch = np.stack([
                big_host[zs + c[0] : zs + c[0] + tin,
                         c[1] : c[1] + tin, c[2] : c[2] + tin]
                for c in local_np[bi]
            ])
            tiles_list.append(batch)
            corners.append([(zs + c[0], c[1], c[2]) for c in local_np[bi]])
    tiles_all = jax.device_put(np.stack(tiles_list))  # (S*nb, B, t, t, t)
    corners_all = jnp.asarray(np.asarray(corners, np.int32))

    def fwd_pregather_sum(tiles_all, i):
        def body(acc, batch):
            x = (batch.astype(jnp.float32) + i.astype(jnp.float32) * 0.0
                 ) * (1.0 / 255.0)
            logits = mod.apply(variables, x[..., None], train=False)
            return acc + jnp.sum(jax.nn.sigmoid(logits[..., 0])), None

        acc, _ = lax.scan(body, jnp.zeros(()), tiles_all)
        return acc

    rec("pregather_sum", timeit(fwd_pregather_sum, (tiles_all,)), out_vox)

    def fwd_pregather_scat(tiles_all, corners_all, i):
        out0 = jnp.zeros(pipe._out_shape, jnp.float32)

        def body(out, args):
            batch, cb = args
            x = (batch.astype(jnp.float32) + i.astype(jnp.float32) * 0.0
                 ) * (1.0 / 255.0)
            logits = mod.apply(variables, x[..., None], train=False)
            probs = jax.nn.sigmoid(logits[..., 0])

            def write(out, wargs):
                tile, c = wargs
                return lax.dynamic_update_slice(
                    out, tile, (c[0], c[1], c[2])), None

            out, _ = lax.scan(write, out, (probs, cb))
            return out, None

        out, _ = lax.scan(body, out0, (tiles_all, corners_all))
        return out

    rec("pregather_scat", timeit(fwd_pregather_scat,
                                 (tiles_all, corners_all)), out_vox)

    # one batch, no scan: the shapes the per-layer parts were timed at
    one = tiles_all[0]
    tout = pipe._tiled.tile_out

    def batch1(one, i):
        x = (one.astype(jnp.float32) + i.astype(jnp.float32) * 0.0) * (
            1.0 / 255.0)
        logits = mod.apply(variables, x[..., None], train=False)
        return jax.nn.sigmoid(logits[..., 0])

    rec("batch1_chain", timeit(batch1, (one,), iters=20),
        B * tout ** 3)


if __name__ == "__main__":
    main()
