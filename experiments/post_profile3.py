"""Per-piece postprocess cost at the 1k^3 sweep's ROI shape (round 3).

The sweep's per-ROI postprocess is TWO dispatches (NMS over the full
528^3 prob region + sparse-CC over the 512^3 core), each with its own
mask_valid_region and its own compaction.  Since NMS candidates are a
subset of threshold candidates, a fused single-dispatch postprocess with
ONE core compaction (gathering an "is local max" bit per candidate)
should cut the per-ROI cost.  This measures each piece standalone plus
the current and proposed composites, at realistic candidate counts
(~15k/ROI at the bench operating point).

python experiments/post_profile.py
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

from flypylib_tpu.ops.components import compact_true_indices
from flypylib_tpu.ops.nms import candidate_mask, mask_valid_region, max_filter

VZ = 528  # prob region (core 512 + 2*h, h = ctx 6 + win//2 2)
H = 8
CZ = 512
WIN = (5, 5, 5)
C = 65536
N = CZ * CZ * CZ


def timed(fn, args, iters=5, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(
            jax.device_get(jax.tree_util.tree_leaves(out)[-1])
        ).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    # ~15k candidates above thr in the core, like the bench operating point
    prob_h = rng.random((VZ, VZ, VZ), np.float32)
    # ~15k above-thr core voxels (the bench operating point): estimate
    # the 1 - 15k/N quantile of the value distribution from a slab
    thr = float(np.quantile(prob_h[:64], 1 - 15000 / N))
    out = jax.device_put(prob_h)
    vlo = jnp.asarray((0, 0, 0), jnp.int32)
    vhi = jnp.asarray((VZ, VZ, VZ), jnp.int32)
    thr_j = jnp.float32(thr)

    rows = []

    def rec(name, ms):
        row = {"name": name, "ms": round(ms * 1e3, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # -- pieces ----------------------------------------------------------
    f_mask = jax.jit(lambda p, lo, hi: mask_valid_region(p, lo, hi)[0])
    rec("mask_valid_region 528^3", timed(f_mask, (out, vlo, vhi)))

    f_mf = jax.jit(lambda p: max_filter(p, WIN))
    rec("max_filter 528^3", timed(f_mf, (out,)))

    f_cand = jax.jit(lambda p, t: candidate_mask(p, WIN, t))
    rec("candidate_mask 528^3", timed(f_cand, (out, thr_j)))

    f_comp_full = jax.jit(
        lambda p, t: compact_true_indices((p >= t).reshape(-1), C)
    )
    rec("thr+compact 528^3", timed(f_comp_full, (out, thr_j)))

    f_comp_core = jax.jit(
        lambda p, t: compact_true_indices(
            (lax.slice(p, (H,) * 3, (H + CZ,) * 3) >= t).reshape(-1), C
        )
    )
    rec("slice+thr+compact core 512^3", timed(f_comp_core, (out, thr_j)))

    def gather_core(p, t):
        corep = lax.slice(p, (H,) * 3, (H + CZ,) * 3).reshape(-1)
        idx = compact_true_indices(corep >= t, C)
        safe = jnp.minimum(idx, N - 1)
        return idx, corep[safe]

    rec("compact+gather core", timed(jax.jit(gather_core), (out, thr_j)))

    # -- current composite: NMS post + sparse CC (2 dispatches) ----------
    @jax.jit
    def post_nms(out, lo, hi, t):
        prob, _ = mask_valid_region(out, lo, hi)
        mask = candidate_mask(prob, WIN, t)
        idx = compact_true_indices(mask.reshape(-1), 32768)
        valid = idx < prob.size
        safe = jnp.minimum(idx, prob.size - 1)
        conf = jnp.where(valid, prob.reshape(-1)[safe], -jnp.inf)
        return idx, conf, valid

    @jax.jit
    def post_cc(out, lo, hi, t):
        prob, _ = mask_valid_region(out, lo, hi)
        corep = lax.slice(prob, (H,) * 3, (H + CZ,) * 3).reshape(-1)
        m = corep >= t
        idx = compact_true_indices(m, C)
        v = idx < N
        probs = jnp.where(v, corep[jnp.minimum(idx, N - 1)], -jnp.inf)
        over = jnp.sum(m, dtype=jnp.int32) > C
        return idx, probs, over

    rec("current: NMS post dispatch", timed(post_nms, (out, vlo, vhi, thr_j)))
    rec("current: sparse-CC dispatch", timed(post_cc, (out, vlo, vhi, thr_j)))

    def both(out, lo, hi, t):
        a = post_nms(out, lo, hi, t)
        b = post_cc(out, lo, hi, t)
        return a, b

    rec("current: both (2 dispatches)", timed(both, (out, vlo, vhi, thr_j)))

    # -- proposed fused single-dispatch ----------------------------------
    LO = [w // 2 for w in WIN]
    HI = [w - 1 - w // 2 for w in WIN]

    @jax.jit
    def fused(out, lo, hi, t):
        prob, _ = mask_valid_region(out, lo, hi)
        sub = lax.slice(
            prob,
            tuple(H - l for l in LO),
            tuple(H + CZ + h_ for h_ in HI),
        )
        mf = max_filter(sub, WIN)
        cand = (sub == mf) & (sub >= t)
        cand_core = lax.slice(
            cand, tuple(LO), tuple(l + CZ for l in LO)
        ).reshape(-1)
        corep = lax.slice(prob, (H,) * 3, (H + CZ,) * 3).reshape(-1)
        m = corep >= t
        idx = compact_true_indices(m, C)
        v = idx < N
        safe = jnp.minimum(idx, N - 1)
        probs = jnp.where(v, corep[safe], -jnp.inf)
        is_max = jnp.where(v, cand_core[safe], False)
        over = jnp.sum(m, dtype=jnp.int32) > C
        return idx, probs, is_max, over

    rec("proposed: fused single dispatch", timed(fused, (out, vlo, vhi, thr_j)))

    # exactness spot check: fused NMS subset == direct candidate list
    idx, probs, is_max, over = jax.device_get(fused(out, vlo, vhi, thr_j))
    v = idx < N
    nms_from_fused = idx[v & np.asarray(is_max)]
    full_mask = np.asarray(
        jax.jit(lambda p, t: candidate_mask(
            mask_valid_region(p, vlo, vhi)[0], WIN, t))(out, thr_j)
    )
    core_mask = full_mask[H:H + CZ, H:H + CZ, H:H + CZ].reshape(-1)
    nms_direct = np.nonzero(core_mask)[0]
    assert not bool(over)
    np.testing.assert_array_equal(nms_from_fused, nms_direct)
    print(f"exactness OK: {len(nms_direct)} NMS candidates, "
          f"{int(v.sum())} CC candidates", flush=True)

    with open("experiments/post_profile3.jsonl", "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
