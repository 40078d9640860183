"""Partial parity split: the untried middle ground between the
production full split (8 parity lattices in batch, c=32 -> lane-padded
4x, the 4.8 ms / 21%-of-forward transpose write) and the rejected pure
"group" variant (g=8 feature-group convs, chain 41.8 vs 24.7 ms).

A dilated stage-B conv connects equal-parity voxels only, so ANY
partition of the 8 parity groups between batch and channels is exact:
move ``p`` leading parities to batch, keep ``g = 8/p`` in channels, and
run stage B as ``feature_group_count=g`` convs with per-group-tiled
weights.  At p=2 the boundary tensor is (2B, d, h, w, 128) — c=128
means ZERO lane padding, so the split transpose writes 4.4x fewer
physical bytes and every stage-B activation gets denser too (L3 out
4*48=192 pads 1.33x vs 2.67x today).  The open question is whether
XLA's grouped-conv lowering at g=2/g=4 keeps the split formulation's
~170 TF/s on L3/L4 (the g=8 rejection measured the full-group variant
only).

Timing mirrors production: phase A (cast+pack+conv1+conv2+split) and
phase B (stage-B convs+head+logits+merge) as SEPARATE dispatches
(chain_fix3: composing them in one executable poisons the first
stage-B conv ~5x even with a barrier), scan-timed each and summed.

python experiments/stageb_psplit.py >> experiments/stageb_psplit.jsonl
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

DIMS = ("NDHWC", "DHWIO", "NDHWC")


def scan_time(f, args, iters=8, reps=3):
    """min over reps of ((time of n=iters) - (time of n=1)) / (iters-1)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype) * 1e-7
            out = f(first, *args[1:])
            return acc + jnp.sum(
                jax.tree.leaves(out)[0].astype(jnp.float32)
            ), None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many(args, n=1))
    float(many(args, n=iters))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(args, n=iters))
        tn = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(many(args, n=1))
        t1 = time.perf_counter() - t0
        best = min(best, (tn - t1) / (iters - 1))
    return max(best, 1e-9)


def main():
    from bench import _flagship
    from flypylib_tpu.ops.packed_conv import unpack_volume
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    pm = pspec.module
    dt = pm.dtype
    params = variables["params"]
    B, tin = (2, 44) if SMOKE else (16, 76)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, tin, tin, tin, 1), np.float32))

    n_body = len(pm.inner.features)  # 4; stage B = layers 2, 3

    def phase_a(x, p):
        """Production stage-A convs + PARTIAL split: p parities to
        batch, 8/p stay in channels (p=8 == apply_stage_a)."""
        from flypylib_tpu.ops.packed_conv import (
            pack_volume,
            pack_weight_d1,
        )

        xp = pack_volume(x.astype(dt))
        for i in range(pm.n_lead):
            w = params[f"Conv_{i}"]["kernel"].astype(dt)
            xp = lax.conv_general_dilated(
                xp, pack_weight_d1(w), (1, 1, 1), "VALID",
                dimension_numbers=DIMS,
            )
            xp = pm._epilogue(variables, xp, i, dt)
        b0, d, h, w_, c8 = xp.shape
        ck = c8 // p
        xp = xp.reshape(b0, d, h, w_, p, ck)
        xp = xp.transpose(0, 4, 1, 2, 3, 5).reshape(b0 * p, d, h, w_, ck)
        return lax.optimization_barrier(xp)

    def phase_b(xa, p):
        g = 8 // p
        x = xa
        for i in range(pm.n_lead, n_body):
            w = params[f"Conv_{i}"]["kernel"].astype(dt)
            if g > 1:
                w = jnp.tile(w, (1, 1, 1, 1, g))
            x = lax.conv_general_dilated(
                x, w, (1, 1, 1), "VALID", dimension_numbers=DIMS,
                feature_group_count=g,
            )
            x = pm._epilogue(variables, x, i, dt, tile=g)
        w = params[f"Conv_{n_body}"]["kernel"].astype(dt)
        b = params[f"Conv_{n_body}"]["bias"].astype(dt)
        if g > 1:
            w = jnp.tile(w, (1, 1, 1, 1, g))
        x = lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID", dimension_numbers=DIMS,
            feature_group_count=g,
        ).astype(dt) + jnp.tile(b, g)
        x = jax.nn.relu(x)
        y = pm._logits_split_weight(x, params, dt, groups=g)
        # y: (p*B, do, ho, wo, co) for g==1 else (p*B, do, ho, wo, g, co)
        pb, do, ho, wo = y.shape[:4]
        co = y.shape[-1]
        y = y.reshape(B, p, do, ho, wo, g * co)
        y = y.transpose(0, 2, 3, 4, 1, 5).reshape(B, do, ho, wo, 8 * co)
        return unpack_volume(y)

    ref = None
    out = {"shape": list(x0.shape), "smoke": SMOKE}
    results = {}
    for p in (8, 4, 2, 1):
        fa = jax.jit(functools.partial(phase_a, p=p))
        fb = jax.jit(functools.partial(phase_b, p=p))
        xa = fa(x0)
        y = fb(xa)
        y.block_until_ready()
        if ref is None:
            ref = np.asarray(y)  # p=8 == production split formulation
            prod = np.asarray(
                pm.apply(variables, x0, train=False)
            )
            out["p8_vs_production_maxdiff"] = float(
                np.max(np.abs(ref - prod))
            )
        else:
            results[f"p{p}_maxdiff"] = float(np.max(np.abs(np.asarray(y) - ref)))
        if SMOKE:  # correctness only (1-CPU sandbox: timing loops too slow)
            print(json.dumps({"p": p, "ok": True,
                              **{k: v for k, v in results.items()
                                 if k.endswith("maxdiff")}}),
                  file=sys.stderr, flush=True)
            continue
        ta = scan_time(lambda x, p=p: phase_a(x, p), (x0,))
        tb = scan_time(lambda xa, p=p: phase_b(xa, p), (xa,))
        results[f"p{p}_phase_a_ms"] = round(ta * 1e3, 3)
        results[f"p{p}_phase_b_ms"] = round(tb * 1e3, 3)
        results[f"p{p}_total_ms"] = round((ta + tb) * 1e3, 3)
        print(json.dumps({"p": p, **{k: v for k, v in results.items()
                                     if k.startswith(f"p{p}")}}),
              file=sys.stderr, flush=True)
    out.update(results)
    vox = B * (tin - 2 * pspec.context) ** 3
    for p in (8, 4, 2, 1):
        if f"p{p}_total_ms" in out:
            out[f"p{p}_mvox_s"] = round(
                vox / (out[f"p{p}_total_ms"] / 1e3) / 1e6, 1
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
