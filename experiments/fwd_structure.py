"""Where does the fused ROI forward's in-graph overhead go?

Parts at t64b16 sum to ~70 ms per 272^3 ROI but the fused forward
measures 132 ms.  Candidates: (a) the 80 MB ``out`` carried through two
nested lax.scans (carry copies), (b) layout conversions XLA inserts
between the convs and the slicing/stitching ops.

Variants timed (all producing the identical prob map, chained on-device):

- ``carry``:    current structure (out carried, DUS per batch)
- ``stacked``:  scan stacks per-batch probs (no carry), ONE
                reshape/transpose assembles the whole ROI
- ``noscatter``: convs only, per-batch reduce (upper bound)

python experiments/fwd_structure.py
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

    def rec(name, dt, out_vox):
        row = {
            "name": name, "ms": round(dt * 1e3, 2),
            "mvox_s": round(out_vox / dt / 1e6, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/fwd_structure.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    open("experiments/fwd_structure.jsonl", "w").close()

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
    tout = pipe._tiled.tile_out
    mod = pipe.spec.module

    origins = jnp.zeros((4, 3), jnp.int32)
    origins = origins.at[1].set(jnp.asarray((1, 0, 0), jnp.int32))
    origins = origins.at[2].set(jnp.asarray((0, 1, 0), jnp.int32))
    origins = origins.at[3].set(jnp.asarray((0, 0, 1), jnp.int32))

    def batch_probs(slab, corner_batch):
        tiles = jax.vmap(
            lambda c: lax.dynamic_slice(
                slab, (c[0], c[1], c[2]), (tin, tin, tin))
        )(corner_batch)
        x = tiles.astype(jnp.float32) * (1.0 / 255.0)
        logits = mod.apply(variables, x[..., None], train=False)
        return jax.nn.sigmoid(logits[..., 0])

    # --- carry: the production structure -----------------------------
    def fwd_carry(big, i):
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

            out, _ = lax.scan(body, out, local)
            return out, None

        out, _ = lax.scan(slab_body, out0, (zs_arr, locals_arr))
        return out

    rec("carry", timeit(fwd_carry, (big,)), out_vox)

    # --- stacked: no carry; one transpose assembles ------------------
    grid = pipe._scatter_grid
    if grid is not None:
        rows_, cols = grid

        def fwd_stacked(big, i):
            origin = origins[i % 4]

            def slab_body(_, args):
                zs, local = args
                slab = lax.dynamic_slice(
                    big, (origin[0] + zs, origin[1], origin[2]),
                    (tin, py, px))

                def body(_, cb):
                    return None, batch_probs(slab, cb)

                _, probs = lax.scan(body, None, local)
                return None, probs  # (nb, B, t, t, t)

            _, allp = lax.scan(slab_body, None, (zs_arr, locals_arr))
            # (S, nb, B=rows*cols, t,t,t) -> (S*t, nb*rows*t, cols*t)
            allp = allp.reshape(S, nb, rows_, cols, tout, tout, tout)
            allp = allp.transpose(0, 4, 1, 2, 5, 3, 6)
            return allp.reshape(S * tout, nb * rows_ * tout, cols * tout)

        rec("stacked", timeit(fwd_stacked, (big,)), out_vox)

    # --- noscatter: convs only (upper bound) -------------------------
    def fwd_nosc(big, i):
        origin = origins[i % 4]

        def slab_body(acc, args):
            zs, local = args
            slab = lax.dynamic_slice(
                big, (origin[0] + zs, origin[1], origin[2]),
                (tin, py, px))

            def body(a, cb):
                probs = batch_probs(slab, cb)
                return a + jnp.sum(probs), None

            a, _ = lax.scan(body, acc, local)
            return a, None

        acc, _ = lax.scan(slab_body, jnp.zeros(()), (zs_arr, locals_arr))
        return acc

    rec("noscatter", timeit(fwd_nosc, (big,)), out_vox)


if __name__ == "__main__":
    main()
