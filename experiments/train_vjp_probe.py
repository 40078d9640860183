"""Attribute the packed-train backward tax stage by stage (round 5).

The b128 anatomy (train_packed_anatomy.jsonl) shows packed fwd +3.1 ms
and packed bwd +9.5 ms over plain; the barrier'd parity custom-vjps
(round-5) moved nothing at b32.  This probe times value_and_grad of
PREFIXES of the packed chain at the bench batch (32) so the backward
cost lands on a named stage:

  p0: cast+pack+stage-A convs (pre-parity-batch)
  p1: + parity_batch (+barrier)
  p2: + parity_split + first stage-B conv (dil-2 layer 3)
  p3: + second dil-2 conv (layer 4)
  p4: + head conv
  p5: full forward_train (f32 logits + 2x parity_merge)

and the same prefixes forward-only, so bwd(stage) = (grad_k - grad_{k-1})
- (fwd_k - fwd_{k-1}) deltas are attributable.  Also times the plain
engine fwd/grad for the same patch count as the reference line.

python experiments/train_vjp_probe.py [batch] >> \
    experiments/train_vjp_probe.jsonl
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def scan_time(fn, args, iters=8, reps=3):
    if SMOKE:
        iters, reps = 2, 1

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(key, args, n):
        def body(carry, k):
            out = fn(k, *args)
            acc = sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree.leaves(out)
            )
            return carry + acc, None

        acc, _ = lax.scan(body, jnp.zeros(()), jax.random.split(key, n))
        return acc

    key = jax.random.PRNGKey(0)
    float(many(key, args, n=1))
    float(many(key, args, n=iters))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(key, args, n=iters))
        tn = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(many(key, args, n=1))
        t1 = time.perf_counter() - t0
        best = min(best, (tn - t1) / (iters - 1))
    return max(best, 1e-9)


def main():
    from flypylib_tpu.models.zoo import baseline_model
    from flypylib_tpu.ops import packed_conv as pc
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spec = (
        baseline_model(features=(8, 8), dilations=(1, 2),
                       head_features=16, dtype=jnp.float32)
        if SMOKE else baseline_model()
    )
    pspec = pc.packed_spec(spec)
    mod: pc.PackedConvStack = pspec.module
    pvox = pspec.valid_size(33)
    if SMOKE:
        batch = 2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, pvox, pvox, pvox, 1)),
                    jnp.float32)
    variables = pspec.init(jax.random.PRNGKey(0), pvox)
    params = variables["params"]
    inner = mod.inner
    n_body = len(inner.features)
    out = {"batch": batch, "patch": pvox}

    def prefix(name, upto):
        """Forward prefix of forward_train; upto in p0..p5."""

        def f(p, xin):
            v = {"params": p}
            dt = mod.dtype
            if upto == "p0":
                # stage-A only, before the parity_batch relayout
                h = pc.pack_volume(xin.astype(dt))
                for i in range(mod.n_lead):
                    w = p[f"Conv_{i}"]["kernel"].astype(dt)
                    h = pc._conv(h, pc.pack_weight_d1(w))
                    h = mod._epilogue(v, h, i, dt)
                return h
            h = mod.apply_stage_a(v, xin)
            if upto == "p1":
                return h
            level = 1
            for i in range(mod.n_lead, n_body):
                d = mod.dilations[i]
                while (1 << level) < d:
                    h = pc.parity_split(h)
                    level += 1
                w = p[f"Conv_{i}"]["kernel"].astype(dt)
                h = pc._conv(h, w)
                h = mod._epilogue(v, h, i, dt, tile=1)
                if upto == "p2" and i == mod.n_lead:
                    return h
            if upto == "p3":
                return h
            w = p[f"Conv_{n_body}"]["kernel"].astype(dt)
            b = p[f"Conv_{n_body}"]["bias"].astype(dt)
            h = pc._conv(h, w).astype(dt) + b
            h = jax.nn.relu(h)
            if upto == "p4":
                return h
            w = p[f"Conv_{n_body + 1}"]["kernel"].astype(jnp.float32)
            b = p[f"Conv_{n_body + 1}"]["bias"].astype(jnp.float32)
            h = pc._conv(h.astype(jnp.float32), w) + b
            for _ in range(level):
                h = pc.parity_merge(h)
            return h

        def loss(p, k):
            # k-dependent epsilon keeps the body live inside the scan
            # (a k-independent loss gets hoisted and times as ~0 — the
            # CLAUDE.md scan-timing gotcha)
            eps = lax.convert_element_type(k[0], jnp.float32) * 1e-30
            return jnp.sum(f(p, x + eps).astype(jnp.float32))

        t_f = scan_time(lambda k, p: loss(p, k), (params,))
        t_g = scan_time(
            lambda k, p: jax.grad(loss)(p, k), (params,)
        )
        out[f"{name}_fwd_ms"] = round(t_f * 1e3, 3)
        out[f"{name}_grad_ms"] = round(t_g * 1e3, 3)
        print(json.dumps({k: v for k, v in out.items()
                          if k.startswith(name)}),
              file=sys.stderr, flush=True)

    for name in ("p0", "p1", "p2", "p3", "p4", "p5"):
        prefix(name, name)

    # plain engine reference at its own valid patch (33)
    from flypylib_tpu.models.zoo import ModelSpec  # noqa: F401

    pvox_plain = spec.valid_size(33)
    xp = jnp.asarray(
        rng.random((batch, pvox_plain, pvox_plain, pvox_plain, 1)),
        jnp.float32,
    )
    vplain = spec.init(jax.random.PRNGKey(0), pvox_plain)

    def loss_plain(p, k):
        eps = lax.convert_element_type(k[0], jnp.float32) * 1e-30
        logits = spec.module.apply({"params": p}, xp + eps, train=False)
        return jnp.sum(logits.astype(jnp.float32))

    out["plain_fwd_ms"] = round(
        scan_time(lambda k, p: loss_plain(p, k),
                  (vplain["params"],)) * 1e3, 3)
    out["plain_grad_ms"] = round(
        scan_time(lambda k, p: jax.grad(loss_plain)(p, k),
                  (vplain["params"],)) * 1e3, 3)
    mv = batch * pvox**3 / 1e6
    out["packed_full_grad_patch_mvox_s"] = round(
        mv / (out["p5_grad_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
