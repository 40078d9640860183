"""Scan-timed breakdown of the 256^3 device-resident detect path.

Decomposes DetectPipeline's device time: forward vs each postprocess
stage (quantile, max-filter mask, top-k extraction vs nonzero
compaction, CC label sweeps, CC extraction).  Run exclusively.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.nms import candidate_mask
from flypylib_tpu.ops.packed_conv import packed_spec


def scan_time(f, args, iters=8):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype) * 1e-7
            out = f(first, *args[1:])
            return acc + sum(
                jnp.sum(o).astype(jnp.float32)
                for o in jax.tree.leaves(out)
            ), None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many(args, n=1))
    float(many(args, n=iters))
    t0 = time.perf_counter()
    float(many(args, n=1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(args, n=iters))
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1)


def main():
    rows = []

    def rec(name, dt):
        row = {"name": name, "ms": round(dt * 1e3, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    rng = np.random.default_rng(0)
    prob = jnp.asarray(
        rng.random((256, 256, 256)).astype(np.float32)
    )
    thr = 0.9999  # ~1.7k candidates

    rec("quantile_1M_sort", scan_time(
        lambda p: jnp.sort(p[::16].reshape(-1))[-100], (prob,)))
    rec("candidate_mask_w5", scan_time(
        lambda p: candidate_mask(p, (5, 5, 5), 0.9999).sum(), (prob,)))

    def extract_topk(p):
        mask = candidate_mask(p, (5, 5, 5), thr)
        flat = jnp.where(mask.reshape(-1), p.reshape(-1), -jnp.inf)
        conf, idx = lax.top_k(flat, 4096)
        return conf.sum() + idx.sum()

    rec("extract_topk_k4096", scan_time(extract_topk, (prob,)))

    def extract_nonzero(p):
        mask = candidate_mask(p, (5, 5, 5), thr)
        n = p.size
        idx = jnp.nonzero(
            mask.reshape(-1), size=4096, fill_value=n
        )[0].astype(jnp.int32)
        conf = jnp.where(
            idx < n, p.reshape(-1)[jnp.minimum(idx, n - 1)], -jnp.inf
        )
        return conf.sum() + idx.sum()

    rec("extract_nonzero_k4096", scan_time(extract_nonzero, (prob,)))

    from flypylib_tpu.ops.components import components_device

    def cc(p):
        c, f, v, o = components_device(
            p, threshold=thr, max_components=4096
        )
        return c.sum() + f.sum()

    rec("components_device", scan_time(cc, (prob,)))

    # forward only, staged (the packed 256^3 tile sweep)
    spec = packed_spec(baseline_model())
    variables = spec.init(jax.random.PRNGKey(0), 140)
    from flypylib_tpu.infer.pipeline import DetectPipeline

    vol = (rng.random((256, 256, 256)) * 255).astype(np.uint8)
    pipe = DetectPipeline(
        spec, variables, vol.shape, tile_out=128, tile_batch=4,
        window=5, threshold_quantile=1 - 2000 / vol.size,
    )
    staged = pipe.stage(vol)
    out = pipe.forward_staged(staged)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    float(jnp.sum(pipe.forward_staged(staged)))
    t1 = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(pipe.forward_staged(staged)))
        times.append(time.perf_counter() - t0)
    rec("forward_staged_256_tile128", min(times))

    t0 = time.perf_counter()
    pipe.postprocess(out)
    rec("postprocess_full(incl_transfer)", time.perf_counter() - t0)

    with open("experiments/post_profile.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
