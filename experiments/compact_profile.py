"""Where do compact_true_indices' 49 ms go at 512^3? (round 3)

The fused streaming postprocess is now dominated by the core compaction
(experiments/post_profile3.jsonl: slice+thr+compact 49 ms of the fused
67 ms).  Ideal bandwidth cost is ~2-3 ms (read 537 MB f32, write the
block cumsum), so something is lowering badly.  Times each internal
stage cumulatively, plus candidate improvements:

- f32 (VPU-native) block sums instead of int32;
- 3-level search: binary-search a superblock cumsum (8k entries,
  VMEM-resident) then contiguous row gathers, replacing the 1M-entry
  searchsorted (20 rounds of random scalar gathers).

python experiments/compact_profile.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 512 ** 3
SIZE = 65536
M = 128


def timed(fn, args, iters=5, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[-1])).ravel()[:1]
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
    prob_h = rng.random((512, 512, 512), np.float32)
    thr = float(np.quantile(prob_h[:32], 1 - 15000 / N))
    prob = jax.device_put(prob_h)
    thr_j = jnp.float32(thr)

    rows = []

    def rec(name, ms):
        row = {"name": name, "ms": round(ms * 1e3, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    R = N // M

    # -- cumulative prefixes of the current scheme -----------------------
    def p_mask(p, t):
        return jnp.sum(p.reshape(-1) >= t, dtype=jnp.int32)

    rec("mask+reduce", timed(jax.jit(p_mask), (prob, thr_j)))

    def p_icum(p, t):
        blk = (p.reshape(R, M) >= t).astype(jnp.int32)
        icum = jnp.cumsum(blk, axis=1)
        return icum[0, -1]

    rec("+block icum (i32)", timed(jax.jit(p_icum), (prob, thr_j)))

    def p_boff(p, t):
        blk = (p.reshape(R, M) >= t).astype(jnp.int32)
        icum = jnp.cumsum(blk, axis=1)
        boff = jnp.cumsum(icum[:, -1])
        return boff[-1]

    rec("+boff cumsum (R=2M)", timed(jax.jit(p_boff), (prob, thr_j)))

    def p_search(p, t):
        blk = (p.reshape(R, M) >= t).astype(jnp.int32)
        icum = jnp.cumsum(blk, axis=1)
        boff = jnp.cumsum(icum[:, -1])
        q = jnp.arange(1, SIZE + 1, dtype=jnp.int32)
        blkid = jnp.searchsorted(boff, q).astype(jnp.int32)
        return blkid.sum()

    rec("+searchsorted 64k q into 2M", timed(jax.jit(p_search), (prob, thr_j)))

    from flypylib_tpu.ops.components import compact_true_indices

    def p_full(p, t):
        return compact_true_indices(p.reshape(-1) >= t, SIZE)

    rec("full compact (current)", timed(jax.jit(p_full), (prob, thr_j)))

    def p_full_gather(p, t):
        idx = compact_true_indices(p.reshape(-1) >= t, SIZE)
        safe = jnp.minimum(idx, N - 1)
        return idx, p.reshape(-1)[safe]

    rec("full compact + value gather", timed(jax.jit(p_full_gather),
                                             (prob, thr_j)))

    # -- candidate: f32 block sums (VPU-native) --------------------------
    def p_icum_f32(p, t):
        blk = (p.reshape(R, M) >= t).astype(jnp.float32)
        icum = jnp.cumsum(blk, axis=1)
        return icum[0, -1]

    rec("block icum in f32", timed(jax.jit(p_icum_f32), (prob, thr_j)))

    # -- candidate: 3-level (superblock) search --------------------------
    S = 128  # blocks per superblock; R/S = 16384 entries ~ 64 KB
    R2 = R // S

    def p_three(p, t):
        blk = (p.reshape(R, M) >= t).astype(jnp.int32)
        icum = jnp.cumsum(blk, axis=1)  # (R, M)
        bsum = icum[:, -1].reshape(R2, S)  # (R2, S)
        scum = jnp.cumsum(bsum, axis=1)  # within-superblock block cumsum
        soff = jnp.cumsum(scum[:, -1])  # (R2,) superblock offsets
        q = jnp.arange(1, SIZE + 1, dtype=jnp.int32)
        sid = jnp.searchsorted(soff, q).astype(jnp.int32)  # tiny array
        inb = sid < R2
        safe_s = jnp.minimum(sid, R2 - 1)
        sbase = jnp.where(safe_s > 0, soff[safe_s - 1], 0)
        srows = scum[safe_s]  # (SIZE, S) contiguous row gather
        qs = (q - sbase)[:, None]
        bpos = jnp.sum(srows < qs, axis=1, dtype=jnp.int32)  # block in sb
        blkid = safe_s * S + bpos
        safe_blk = jnp.minimum(blkid, R - 1)
        bbase = sbase + jnp.where(
            bpos > 0, srows[jnp.arange(SIZE), jnp.maximum(bpos - 1, 0)], 0
        )
        rows_g = icum[safe_blk]  # (SIZE, M) contiguous row gather
        qq = (q - bbase)[:, None]
        pos_in = jnp.sum(rows_g < qq, axis=1, dtype=jnp.int32)
        idx = safe_blk * M + pos_in
        return jnp.where(inb & (idx < N), idx, N).astype(jnp.int32)

    rec("3-level compact", timed(jax.jit(p_three), (prob, thr_j)))

    # -- candidate: no-icum — gather RAW mask rows, cumsum only those ----
    def p_noicum(p, t):
        blk = p.reshape(R, M) >= t  # bool, never cumsum'd in full
        bsum = jnp.sum(blk, axis=1, dtype=jnp.int32)  # (R,)
        boff = jnp.cumsum(bsum)
        q = jnp.arange(1, SIZE + 1, dtype=jnp.int32)
        blkid = jnp.searchsorted(boff, q).astype(jnp.int32)
        inb = blkid < R
        safe_blk = jnp.minimum(blkid, R - 1)
        base = jnp.where(safe_blk > 0, boff[safe_blk - 1], 0)
        rows = blk[safe_blk].astype(jnp.int32)  # (SIZE, M) row gather
        rcum = jnp.cumsum(rows, axis=1)
        qq = (q - base)[:, None]
        pos_in = jnp.sum(rcum < qq, axis=1, dtype=jnp.int32)
        idx = safe_blk * M + pos_in
        return jnp.where(inb & (idx < N), idx, N).astype(jnp.int32)

    rec("no-icum compact", timed(jax.jit(p_noicum), (prob, thr_j)))

    # -- no-icum + superblock search -------------------------------------
    def p_noicum3(p, t):
        blk = p.reshape(R, M) >= t
        bsum = jnp.sum(blk, axis=1, dtype=jnp.int32)  # (R,)
        scum = jnp.cumsum(bsum.reshape(R2, S), axis=1)  # (R2, S)
        soff = jnp.cumsum(scum[:, -1])  # (R2,)
        q = jnp.arange(1, SIZE + 1, dtype=jnp.int32)
        sid = jnp.searchsorted(soff, q).astype(jnp.int32)  # 16k entries
        inb = sid < R2
        safe_s = jnp.minimum(sid, R2 - 1)
        sbase = jnp.where(safe_s > 0, soff[safe_s - 1], 0)
        srows = scum[safe_s]  # (SIZE, S) contiguous row gather
        qs = (q - sbase)[:, None]
        bpos = jnp.sum(srows < qs, axis=1, dtype=jnp.int32)
        blkid = safe_s * S + bpos
        safe_blk = jnp.minimum(blkid, R - 1)
        bbase = sbase + jnp.where(
            bpos > 0, srows[jnp.arange(SIZE), jnp.maximum(bpos - 1, 0)], 0
        )
        rows = blk[safe_blk].astype(jnp.int32)
        rcum = jnp.cumsum(rows, axis=1)
        qq = (q - bbase)[:, None]
        pos_in = jnp.sum(rcum < qq, axis=1, dtype=jnp.int32)
        idx = safe_blk * M + pos_in
        return jnp.where(inb & (idx < N), idx, N).astype(jnp.int32)

    rec("no-icum + superblock search", timed(jax.jit(p_noicum3),
                                             (prob, thr_j)))

    # exactness: all variants == current
    a = np.asarray(jax.jit(p_full)(prob, thr_j))
    for name, f in (("3-level", p_three), ("no-icum", p_noicum),
                    ("no-icum3", p_noicum3)):
        b = np.asarray(jax.jit(f)(prob, thr_j))
        np.testing.assert_array_equal(a, b, err_msg=name)
    print("all variants == current: OK", flush=True)

    with open("experiments/compact_profile.jsonl", "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
