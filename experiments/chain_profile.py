"""Device-only vs host-dispatched timing of the fused ROI forward.

Separates in-graph time from dispatch/tunnel overhead for the staged
streaming engine (infer/large.detect_staged):

- ``fused_chained``: the whole-ROI single-dispatch forward
  (DetectPipeline._fwd_from_fused) chained n times inside one lax.scan
  dispatch, cycling through ROI origins to defeat CSE — pure device time;
- ``fused_dispatch``: the same forward called from the host per ROI with
  one final sync — adds dispatch overhead;
- ``gather16``: the 16-tile vmap dynamic_slice + u8 cast alone, with the
  slab index perturbed per iteration (a u8 input can't be perturbed
  arithmetically without changing the math).

python experiments/chain_profile.py
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


def main():
    rng = np.random.default_rng(0)
    rows = []

    def rec(name, dt, out_vox=None):
        row = {"name": name, "ms": round(dt * 1e3, 3)}
        if out_vox:
            row["mvox_s"] = round(out_vox / dt / 1e6, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/chain_profile.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    open("experiments/chain_profile.jsonl", "w").close()

    spec = baseline_model()
    pspec = packed_spec(spec)
    tin = pspec.valid_size(128 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)

    size = 256
    vol = rng.integers(0, 255, (size,) * 3).astype(np.uint8)
    plan = make_stream_plan(pspec, variables, vol.shape, core=256,
                            window=5, threshold=0.9)
    pipe = plan.pipe
    big, halo = stage_volume(vol, plan=plan)
    # grid-extend like detect_staged does
    pad_hi = [
        max(0, pipe.padded_shape[d] - big.shape[d]) for d in range(3)
    ]
    big = jnp.pad(big, [(0, p) for p in pad_hi])
    out_vox = int(np.prod(pipe.vol_shape))

    fwd = pipe._fwd_from_fused
    assert fwd is not None
    origins = jnp.zeros((4, 3), jnp.int32)  # single-ROI volume: origin 0
    # perturb origins by epsilon shifts that stay in bounds to defeat CSE
    origins = origins.at[1].set(jnp.asarray((1, 0, 0), jnp.int32))
    origins = origins.at[2].set(jnp.asarray((0, 1, 0), jnp.int32))
    origins = origins.at[3].set(jnp.asarray((0, 0, 1), jnp.int32))

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(big, n):
        def body(acc, i):
            out = fwd(variables, big, origins[i % 4])
            # full-reduce so no tile write can be dead-code-eliminated
            return acc + jnp.sum(out), None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many(big, n=1))
    float(many(big, n=5))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(big, n=1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(many(big, n=5))
        tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / 4)
    rec("fused_chained", best, out_vox)

    # host-dispatched: n forwards queued back-to-back, one forcing get
    def host_run(n):
        outs = [
            fwd(variables, big, origins[i % 4]) for i in range(n)
        ]
        np.asarray(outs[-1][:1, :1, :1])  # force through the tunnel
        return outs

    host_run(1)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        host_run(1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        host_run(5)
        tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / 4)
    rec("fused_dispatch", best, out_vox)

    # gather-only: 16 tiles from a u8 slab, slab z-index perturbed
    slab = jnp.asarray(rng.integers(0, 255, (80, 336, 336)), jnp.uint8)
    corners = jnp.asarray(
        [(0, 64 * (i // 4), 64 * (i % 4)) for i in range(16)], jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def many_g(slab, n):
        def body(acc, i):
            t = jax.vmap(
                lambda c: lax.dynamic_slice(
                    slab, (c[0] + i % 4, c[1], c[2]), (76, 76, 76)
                )
            )(corners)
            x = t.astype(jnp.float32) * (1.0 / 255.0)
            return acc + x[0, 0, 0, 0], None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many_g(slab, n=1))
    float(many_g(slab, n=8))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(many_g(slab, n=1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(many_g(slab, n=8))
        tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / 7)
    rec("gather16_u8_cast", best, 16 * 64**3)

    # staged-path postprocess at the 1k^3/core-512 ROI shape (528^3):
    # candidate mask + in-bounds masking + compaction, no CC
    plan512 = make_stream_plan(pspec, variables, (1024,) * 3, core=512,
                               window=5, threshold=0.9,
                               max_detections_per_roi=8192)
    p = plan512.pipe
    post = p._post_for(8192, p.max_components)
    oshape = p._out_shape
    outv = jnp.asarray(
        rng.random(oshape, dtype=np.float32) * 0.5, jnp.float32
    )
    lo = jnp.asarray((0, 0, 0), jnp.int32)
    hi = jnp.asarray(p.vol_shape, jnp.int32)
    thr = jnp.float32(0.9)

    @functools.partial(jax.jit, static_argnames=("n",))
    def many_p(outv, n):
        def body(acc, i):
            o = outv + i.astype(jnp.float32) * 1e-7
            (locs, conf, valid), _, n_inb = post(o, lo, hi, thr)
            return (
                acc + jnp.sum(jnp.where(valid, conf, 0.0))
                + n_inb.astype(jnp.float32),
                None,
            )

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many_p(outv, n=1))
    float(many_p(outv, n=5))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(many_p(outv, n=1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(many_p(outv, n=5))
        tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / 4)
    rec("post528_nms_only", best, int(np.prod(oshape)))


if __name__ == "__main__":
    main()
