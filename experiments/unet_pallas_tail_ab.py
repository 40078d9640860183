"""Full-forward A/B of the PackedUNet level-0 Pallas tail (round 6).

Standalone, the fused Pallas tail avoids the two ~2 GB level-0 HBM
intermediates that make dec0_fold collapse in-chain (52.9 TF/s,
unet_prefix2.jsonl).  This measures what actually matters: the FULL
production tin-388 forward with ``tail_impl='pallas'`` vs the XLA
tail, outputs compared at f32 (the kernel's tap-accumulation order
differs by design — ~1 ulp bf16).

python experiments/unet_pallas_tail_ab.py [variant ...]
  variants: chain2x2, fold3x3, ... (default fold3x3 — the standalone
  winner: 47.1 ms vs xla 62.6 standalone / 74.7 in-chain)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_unet import PackedUNet
from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "experiments/unet_pallas_tail_ab.jsonl"
TIN = int(os.environ.get("AB_TIN", "388"))


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")


def timeit(fn, x, iters=4, reps=3):
    fn(x).block_until_ready()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        # force a real device roundtrip (block_until_ready is unreliable
        # through the tunnel — CLAUDE.md)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    blocks = []
    for a in sys.argv[1:]:
        # fold2/chain2 = the PRE-concat two-ref kernels (packed_tail2)
        if a.startswith("fold2"):
            kind, rest = "pallas_fold2", a.removeprefix("fold2")
        elif a.startswith("chain2"):
            kind, rest = "pallas2", a.removeprefix("chain2")
        elif a.startswith("fold"):
            kind, rest = "pallas_fold", a.removeprefix("fold")
        else:
            kind, rest = "pallas", a.removeprefix("chain")
        parts = rest.lstrip("-_").split("x")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            raise SystemExit(
                f"bad variant {a!r}: expected fold<Z>x<Y>, chain<Z>x<Y>, "
                "fold2-<Z>x<Y>, or chain2-<Z>x<Y> (e.g. fold2-3x3)"
            )
        blocks.append((kind, int(parts[0]), int(parts[1])))
    if not blocks:
        blocks = [("pallas_fold", 3, 3)]

    spec = unet()  # eval config 4
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    small = spec.min_size
    variables = spec.module.init(
        key, jnp.zeros((1, small, small, small, 1), jnp.float32), train=False
    )
    x = jnp.asarray(
        rng.standard_normal((1, TIN, TIN, TIN, 1)).astype(np.float32)
    )
    tout = TIN - 2 * spec.context
    vox = tout ** 3

    pm_xla = PackedUNet(spec.module)
    fwd_xla = jax.jit(lambda v, x: pm_xla.apply(v, x))
    t0 = time.perf_counter()
    ref = fwd_xla(variables, x)
    # d2h of the full prob map crawls through the tunnel (~0.2 MB/s
    # observed this session) — compare ON DEVICE, transfer scalars only
    emit({"variant": "xla", "compile_s": round(time.perf_counter() - t0, 1),
          "ref_scale": float(jnp.abs(ref).max())})
    dt = timeit(lambda x: fwd_xla(variables, x), x)
    emit({"variant": "xla", "ms": round(dt * 1e3, 2),
          "mvox_s": round(vox / dt / 1e6, 1)})

    diff = jax.jit(
        lambda a, b: jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)
        ).max()
    )
    for kind, bz, by in blocks:
        name = f"{kind}_b{bz}x{by}"
        try:
            pm = PackedUNet(
                spec.module, tail_impl=kind,
                tail_block=(bz, by, 1 << 30),
            )
            fwd = jax.jit(lambda v, x, pm=pm: pm.apply(v, x))
            t0 = time.perf_counter()
            out = fwd(variables, x)
            md = float(diff(out, ref))
            emit({"variant": name, "max_diff": md,
                  "compile_s": round(time.perf_counter() - t0, 1)})
            del out
            dt = timeit(lambda x, fwd=fwd: fwd(variables, x), x)
            emit({"variant": name, "ms": round(dt * 1e3, 2),
                  "mvox_s": round(vox / dt / 1e6, 1)})
        except Exception as e:
            emit({"variant": name,
                  "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
