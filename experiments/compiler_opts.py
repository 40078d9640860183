"""XLA TPU compiler-option sweep on the two production forwards.

Untried lever for the conv-bound engines: per-jit
``compiler_options`` — notably ``xla_tpu_scoped_vmem_limit_kib``
(bigger scoped VMEM lets the TPU backend pick larger conv tile shapes
/ deeper fusions).  Sweeps the packed ConvStack chain (t64b16, the
1k^3 workhorse) and the packed U-Net (t96b2, eval config 4) over a
few values; unknown/rejected options are recorded and skipped.

python experiments/compiler_opts.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from flypylib_tpu.models.zoo import baseline_model, unet
from flypylib_tpu.ops.packed_conv import packed_spec
from flypylib_tpu.ops.packed_unet import packed_unet_spec

ROWS = []


def rec(row):
    ROWS.append(row)
    print(json.dumps(row), flush=True)
    with open("experiments/compiler_opts.jsonl", "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")


def timed(fn, args, iters=8, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.device_get(out)).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def sweep(name, spec_fn, pspec_fn, tile_out, batch):
    spec = spec_fn()
    pspec = pspec_fn(spec)
    pm = pspec.module
    tin = pspec.valid_size(tile_out + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, tin, tin, tin, 1)), jnp.float32)
    vox = batch * (tin - 2 * pspec.context) ** 3

    def fwd(v, x):
        return pm.apply(v, x, train=False)

    base = timed(jax.jit(fwd), (variables, x))
    rec({"model": name, "opts": "default", "ms": round(base * 1e3, 2),
         "mvox_s": round(vox / base / 1e6, 1)})

    cases = [
        {"xla_tpu_scoped_vmem_limit_kib": "32768"},
        {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    ]
    for opts in cases:
        try:
            f = jax.jit(fwd, compiler_options=opts)
            dt = timed(f, (variables, x))
            rec({"model": name, "opts": opts, "ms": round(dt * 1e3, 2),
                 "mvox_s": round(vox / dt / 1e6, 1)})
        except Exception as e:  # noqa: BLE001 — record and continue
            rec({"model": name, "opts": opts, "error": str(e)[:200]})


def main():
    sweep("packed_chain_t64b16", baseline_model, packed_spec, 64, 16)
    sweep("packed_unet_t96b2", unet, packed_unet_spec, 96, 2)


if __name__ == "__main__":
    main()
