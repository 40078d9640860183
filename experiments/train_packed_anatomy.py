"""Attribute the packed train engine's ~125 patch-Mvox/s plateau
(BENCH_NOTES round 4c: plain keeps scaling to b128=173 while packed is
flat from b32) to its components at the plateau batch.

Pieces timed as one-dispatch scans at batch 128, patch from the packed
spec (34^3):

- sample+augment only (shared by both engines)
- plain fwd / packed fwd (value only)
- plain step / packed step (value_and_grad + adam)

If (packed step - packed fwd) >> (plain step - plain fwd), the tax is
the BACKWARD of the pack/unpack relayouts (transposed transposes +
the f32 logits conv's grad); if packed fwd alone is already slow at
b128, it is the forward relayouts.

python experiments/train_packed_anatomy.py >> \
    experiments/train_packed_anatomy.jsonl
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
    """One jitted scan of n iters; (t(n) - t(1)) / (n - 1), min of reps."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(key, args, n):
        def body(carry, k):
            out = fn(k, *args)
            acc = sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree.leaves(out)
            )
            return carry + acc, None

        acc, _ = lax.scan(
            body, jnp.zeros(()), jax.random.split(key, n)
        )
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
    from flypylib_tpu.train.trainer import (
        TrainConfig,
        TrainData,
        make_loss_fn,
        masked_bce_loss,
    )
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec = (
        baseline_model(features=(8, 8), dilations=(1, 2),
                       head_features=16, dtype=jnp.float32)
        if SMOKE else baseline_model()
    )
    batch = 4 if SMOKE else 128
    size = 48 if SMOKE else 128
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (size,) * 3).astype(np.uint8)
    labels = (rng.random((size,) * 3) > 0.999).astype(np.float32)
    mask = np.ones((size,) * 3, np.float32)

    out = {"batch": batch, "smoke": SMOKE}
    for engine in ("plain", "packed"):
        cfg = TrainConfig(patch_size=33, batch_size=batch, augment=True,
                          engine=engine)
        loss_fn, pvox = make_loss_fn(spec, cfg)
        data = TrainData.build(image, labels, mask, pvox)
        from flypylib_tpu.train.trainer import resolve_train_spec

        tspec = resolve_train_spec(spec, cfg)
        variables = tspec.init(jax.random.PRNGKey(0), pvox)
        params = variables["params"]

        # forward (loss value) only
        t_fwd = scan_time(
            lambda k, p: loss_fn(p, {}, k, data)[0], (params,)
        )
        # value_and_grad (no optimizer: isolates the bwd pass)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        t_grad = scan_time(
            lambda k, p: grad_fn(p, {}, k, data)[1], (params,)
        )
        mv = batch * pvox**3 / 1e6
        out[f"{engine}_patch_vox"] = pvox
        out[f"{engine}_fwd_ms"] = round(t_fwd * 1e3, 3)
        out[f"{engine}_grad_ms"] = round(t_grad * 1e3, 3)
        out[f"{engine}_bwd_ms"] = round((t_grad - t_fwd) * 1e3, 3)
        out[f"{engine}_grad_patch_mvox_s"] = round(mv / t_grad, 1)
        print(json.dumps({k: v for k, v in out.items()
                          if k.startswith(engine)}),
              file=sys.stderr, flush=True)

    # sampling+augment alone (engine-independent): gather + augment,
    # reduced — approximates the shared input-pipeline cost
    cfg = TrainConfig(patch_size=33, batch_size=batch, augment=True)
    from flypylib_tpu.ops.augment import AUGMENT_GROUP_SIZE, augment_patch
    from flypylib_tpu.train.trainer import _gather, _sample_batch

    patch = 33
    data = TrainData.build(image, labels, mask, patch)

    def sample_only(key):
        k1, k2 = jax.random.split(key)
        vidx, corners = _sample_batch(k1, batch, data, patch, cfg)
        x = jax.vmap(
            lambda v, c: _gather(data.images, v, c, patch)
        )(vidx, corners).astype(jnp.float32)
        codes = jax.random.randint(k2, (batch,), 0, AUGMENT_GROUP_SIZE)
        return jax.vmap(augment_patch)(x, codes)

    out["sample_augment_ms"] = round(
        scan_time(lambda k: sample_only(k), ()) * 1e3, 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
