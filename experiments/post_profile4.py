"""Round-3b: trim the fused streaming postprocess (55 ms/ROI at 528^3).

The production fused fn (large.py _fused_sparse_fn) does full-volume
work for a ~15-64k candidate result: a 516^3 separable max filter
(3 reduce_window passes), a materialized candidate mask + slice, a
full-volume `over` sum, and the 3-level compaction's one full pass.

Candidate trim measured here: NMS candidates are exactly the compacted
threshold candidates whose 5^3 neighborhood holds no larger value — so
after compaction, gather each candidate's 125-neighborhood (ONE XLA
gather of (C,125) from the flat prob region) and reduce, with
out-of-volume neighbors -inf'd by coordinate compare.  Deletes the max
filter, the cand materialization, and the masked-prob write; `over`
comes from a block-count sum (tiny) instead of a full-volume sum.

Semantics preserved exactly: candidate iff no neighbor (within the
window, true-data halo included) is strictly larger AND value >= thr
AND voxel in [vlo, vhi) — plateau ties all remain candidates, same as
``sub == max_filter(sub)`` (a voxel equals the window max iff no
neighbor exceeds it).

python experiments/post_profile4.py
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
from flypylib_tpu.ops.nms import mask_valid_region, max_filter

VZ = 528
H = 8
CZ = 512
WIN = (5, 5, 5)
C = 65536
N = CZ * CZ * CZ
LO = [w // 2 for w in WIN]
HI = [w - 1 - w // 2 for w in WIN]


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


@jax.jit
def fused_prod(out, vlo, vhi, thr):
    """Copy of the production _fused_sparse_fn body (large.py:370)."""
    prob = out[:VZ, :VZ, :VZ]
    prob, _ = mask_valid_region(prob, vlo, vhi)
    sub = lax.slice(
        prob,
        (H - LO[0], H - LO[1], H - LO[2]),
        (H + CZ + HI[0], H + CZ + HI[1], H + CZ + HI[2]),
    )
    mf = max_filter(sub, WIN)
    cand = (sub == mf) & (sub >= thr)
    cand_core = lax.slice(
        cand, tuple(LO), (LO[0] + CZ, LO[1] + CZ, LO[2] + CZ)
    ).reshape(-1)
    corep = lax.slice(prob, (H, H, H), (H + CZ, H + CZ, H + CZ)).reshape(-1)
    m = corep >= thr
    cap = min(C, N)
    idx = compact_true_indices(m, cap)
    v = idx < N
    safe = jnp.minimum(idx, N - 1)
    probs = jnp.where(v, corep[safe], -jnp.inf)
    is_max = jnp.where(v, cand_core[safe], False)
    over = jnp.sum(m, dtype=jnp.int32) > cap
    return idx, probs, is_max, over


@jax.jit
def fused_nbr(out, vlo, vhi, thr):
    """Neighborhood-gather variant: no max filter, no masked-prob or
    candidate-mask materialization."""
    prob = out[:VZ, :VZ, :VZ]
    flat = prob.reshape(-1)
    # core threshold mask with in-volume test fused (no masked write)
    corep_raw = lax.slice(
        prob, (H, H, H), (H + CZ, H + CZ, H + CZ)
    ).reshape(-1)
    zz = lax.broadcasted_iota(jnp.int32, (CZ, CZ, CZ), 0) + H
    yy = lax.broadcasted_iota(jnp.int32, (CZ, CZ, CZ), 1) + H
    xx = lax.broadcasted_iota(jnp.int32, (CZ, CZ, CZ), 2) + H
    inb = (
        (zz >= vlo[0]) & (zz < vhi[0])
        & (yy >= vlo[1]) & (yy < vhi[1])
        & (xx >= vlo[2]) & (xx < vhi[2])
    ).reshape(-1)
    m = inb & (corep_raw >= thr)
    cap = min(C, N)
    idx = compact_true_indices(m, cap)
    v = idx < N
    safe = jnp.minimum(idx, N - 1)
    probs = jnp.where(v, corep_raw[safe], -jnp.inf)
    # candidate coords in prob-region space
    cz = safe // (CZ * CZ) + H
    rem = safe % (CZ * CZ)
    cy = rem // CZ + H
    cx = rem % CZ + H
    # (125, 3) neighbor offsets, self included (self <= self never kills)
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-LO[0], HI[0] + 1),
            jnp.arange(-LO[1], HI[1] + 1),
            jnp.arange(-LO[2], HI[2] + 1),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3).astype(jnp.int32)
    nz = cz[:, None] + offs[None, :, 0]
    ny = cy[:, None] + offs[None, :, 1]
    nx = cx[:, None] + offs[None, :, 2]
    nflat = (nz * VZ + ny) * VZ + nx
    nval = flat[nflat.reshape(-1)].reshape(nflat.shape)
    ninb = (
        (nz >= vlo[0]) & (nz < vhi[0])
        & (ny >= vlo[1]) & (ny < vhi[1])
        & (nx >= vlo[2]) & (nx < vhi[2])
    )
    nval = jnp.where(ninb, nval, -jnp.inf)
    is_max = v & jnp.all(nval <= probs[:, None], axis=1)
    over = jnp.sum(m, dtype=jnp.int32) > cap
    return idx, probs, is_max, over


def main():
    rng = np.random.default_rng(0)
    prob_h = rng.random((VZ, VZ, VZ), np.float32)
    thr = float(np.quantile(prob_h[:64], 1 - 15000 / N))
    out = jax.device_put(prob_h)
    # face ROI: two volume faces inside the prob region (like every ROI
    # of the 2x2x2 1k^3 grid)
    vlo = jnp.asarray((H, H, 0), jnp.int32)
    vhi = jnp.asarray((VZ, VZ, VZ - 4), jnp.int32)
    thr_j = jnp.float32(thr)

    rows = []

    def rec(name, ms):
        row = {"name": name, "ms": round(ms * 1e3, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # exactness first
    a = jax.device_get(fused_prod(out, vlo, vhi, thr_j))
    b = jax.device_get(fused_nbr(out, vlo, vhi, thr_j))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    assert bool(a[3]) == bool(b[3])
    nc = int((a[0] < N).sum())
    print(f"exact: {nc} candidates, {int(a[2].sum())} local maxima",
          flush=True)

    rec("fused prod (current)", timed(fused_prod, (out, vlo, vhi, thr_j)))
    rec("fused nbr-gather", timed(fused_nbr, (out, vlo, vhi, thr_j)))

    # pieces for attribution
    f_mf = jax.jit(lambda p: max_filter(
        lax.slice(p, (H - 2,) * 3, (H + CZ + 2,) * 3), WIN))
    rec("max_filter 516^3", timed(f_mf, (out,)))

    f_comp = jax.jit(lambda p, t: compact_true_indices(
        (lax.slice(p, (H,) * 3, (H + CZ,) * 3) >= t).reshape(-1), C))
    rec("slice+thr+compact", timed(f_comp, (out, thr_j)))

    with open("experiments/post_profile4.jsonl", "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
