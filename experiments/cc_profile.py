"""Stage-timed profile of the CC path at the 1k^3/core-512 ROI shape.

python experiments/cc_profile.py [size]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.ops.components import (
    _neighbor_min, cc_label_and_extract, compact_true_indices,
)


def scan_time(f, args, iters=5, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            if jnp.issubdtype(args[0].dtype, jnp.floating):
                first = args[0] + i.astype(args[0].dtype) * 1e-9
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


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0)
    rows = []

    def rec(name, dt):
        row = {"name": name, "ms": round(dt * 1e3, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/cc_profile.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")

    open("experiments/cc_profile.jsonl", "w").close()

    # blob-like volume: ~15k small components above 0.9
    vol = rng.random((size,) * 3, dtype=np.float32) * 0.5
    n_blob = 15000 * size**3 // 1024**3 + 10
    centers = rng.integers(3, size - 3, (n_blob, 3))
    for c in centers:
        vol[c[0] - 1 : c[0] + 2, c[1] - 1 : c[1] + 2, c[2]] = 0.95
    prob = jnp.asarray(vol)
    thr = jnp.float32(0.9)
    n = size**3
    sentinel = jnp.int32(n)

    # (a) one 4-sweep block of neighbor-min propagation
    def sweeps4(prob):
        mask = prob >= thr
        idx = jnp.arange(n, dtype=jnp.int32).reshape(prob.shape)
        lab = jnp.where(mask, idx, sentinel)
        for _ in range(4):
            lab = _neighbor_min(lab, mask, sentinel)
        return lab

    rec("sweeps4", scan_time(sweeps4, (prob,)))

    # (b) compaction alone (cumsum + searchsorted) at K=512k
    def compact(prob):
        mask = (prob >= thr).reshape(-1)
        return compact_true_indices(mask, 16 * 32768)

    rec("compact_524k", scan_time(compact, (prob,)))

    # (c) the full CC core at the production budget
    def full(prob):
        uniq, sums, count, conf, valid, over, lab = cc_label_and_extract(
            prob, thr, 32768
        )
        return sums

    rec("cc_full_k32768", scan_time(full, (prob,), iters=3))

    # (d) full CC at the old default budget
    def full_small(prob):
        uniq, sums, count, conf, valid, over, lab = cc_label_and_extract(
            prob, thr, 4096
        )
        return sums

    rec("cc_full_k4096", scan_time(full_small, (prob,), iters=3))

    # (e) segment ops alone at 512k candidates / 32k segments
    cand = jnp.asarray(
        np.sort(rng.choice(n, 16 * 32768, replace=False)), jnp.int32
    )
    segs = jnp.asarray(
        rng.integers(0, 32769, 16 * 32768), jnp.int32
    )
    w = jnp.asarray(rng.random(16 * 32768), jnp.float32)

    def segops(w, segs):
        c = jax.ops.segment_sum(w, segs, 32769)
        s = jax.ops.segment_sum(w * 2.0, segs, 32769)
        m = jax.ops.segment_max(w, segs, 32769)
        return c + s + m

    rec("segment_ops_524k_32k", scan_time(segops, (w, segs)))

    # (f) top_k over 524k keys with k=32768
    key = jnp.asarray(rng.integers(-n, 0, 16 * 32768), jnp.int32)

    def topk(key):
        v, _ = lax.top_k(key, 32768)
        return v

    rec("topk_524k_32k", scan_time(topk, (key,)))


if __name__ == "__main__":
    main()
