"""Can packed-domain training lift config 3? (round 3)

The train step is plain-conv bound (~24 TFLOP/s incl. backward at
batch 32 x 33^3 — BENCH_NOTES round 1); the packed space-to-depth
rewrite is an exact linear re-association, so its forward AND backward
are valid training computations on the same params tree.  Probe:
value_and_grad of a BCE loss through (a) the plain ConvStack forward
and (b) the PackedConvStack forward, same batch geometry, timed
per-step.

python experiments/train_packed_probe.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.packed_conv import packed_spec
from flypylib_tpu.train.trainer import masked_bce_loss


def timed_steps(step, state0, iters=20, reps=3):
    state = step(state0)
    jax.block_until_ready(state)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(state)[0])).ravel()[:1]

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(state, n):
        return lax.fori_loop(0, n, lambda i, s: step_body(s), state)

    def step_body(s):
        return step(s)

    many(state, n=1)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(state, n=iters)
        np.asarray(
            jax.device_get(jax.tree_util.tree_leaves(out)[0])
        ).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    spec = baseline_model()
    pspec = packed_spec(spec)
    B = 32
    rows = []

    def rec(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open("experiments/train_packed_probe.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    for name, sp, patch in [
        ("plain_p33", spec, 33),
        ("plain_p34", spec, 34),
        ("packed_p34", pspec, pspec.valid_size(34)),
        ("packed_p46", pspec, pspec.valid_size(46)),
    ]:
        patch = sp.valid_size(patch)
        out = patch - 2 * sp.context
        variables = spec.init(jax.random.PRNGKey(0), patch)
        params = variables["params"]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((B, patch, patch, patch, 1)),
                        jnp.float32)
        y = jnp.asarray(
            (rng.random((B, out, out, out)) > 0.99), jnp.float32
        )
        m = jnp.ones((B, out, out, out), jnp.float32)

        if name.startswith("packed"):
            def fwd(p, x):
                return sp.module.forward_train({"params": p}, x)[..., 0]
        else:
            def fwd(p, x):
                return sp.module.apply({"params": p}, x,
                                       train=True)[..., 0]

        def loss(p):
            return masked_bce_loss(fwd(p, x), y, m)

        gf = jax.value_and_grad(loss)

        def step(p):
            _, g = gf(p)
            return jax.tree.map(lambda a, b: a - 1e-3 * b, p, g)

        try:
            dt = timed_steps(jax.jit(step), params)
            vox = B * out**3
            rec({"name": name, "patch": patch, "out": out,
                 "ms_per_step": round(dt * 1e3, 2),
                 "patch_mvox_s": round(vox / dt / 1e6, 1)})
        except Exception as e:  # noqa: BLE001
            rec({"name": name, "patch": patch, "error": str(e)[:200]})


if __name__ == "__main__":
    main()
