"""Isolate which packed_tail structure/shape crashes the Mosaic compiler.

The full dec0-shape sweep (pallas_tail_bench.py) fails with
compile-helper exit 1 at N=176 even after the index-map fix, while a
single-stage N=48 probe compiles and matches.  Bisect over (N, depth,
logits, block) and record one line per probe.

python experiments/tail_isolate.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flypylib_tpu.ops.pallas_tail import packed_tail
from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "experiments/tail_isolate.jsonl"
rng = np.random.default_rng(0)


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def mk(shape, dt=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape) * 0.1, dt)


def probe(name, N, stages_ch, logits, block):
    C0 = stages_ch[0]
    x = mk((N, N, N, C0))
    stages = [
        (mk((2, 2, 2, stages_ch[i], stages_ch[i + 1])), mk((stages_ch[i + 1],)))
        for i in range(len(stages_ch) - 1)
    ]
    lg = None
    if logits:
        L = 8
        wl = mk((stages_ch[-1], 2 * L))
        bl = jnp.asarray(rng.standard_normal((L,)), jnp.float32)
        lg = (wl, bl)
    t0 = time.perf_counter()
    try:
        out = jax.jit(lambda x: packed_tail(x, stages, lg, block=block))(x)
        out.block_until_ready()
        emit({"probe": name, "ok": True, "shape": list(out.shape),
              "compile_s": round(time.perf_counter() - t0, 1)})
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines()
               if "Mosaic" in l or "exceeded" in l or "INTERNAL" in l][:2]
        emit({"probe": name, "ok": False,
              "err": (" | ".join(key) or msg)[:300],
              "compile_s": round(time.perf_counter() - t0, 1)})


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        # spec: name:N:ch0,ch1,...:logits01:bz,by
        name, N, chs, lg, blk = spec.split(":")
        chs = [int(c) for c in chs.split(",")]
        bz, by = (int(v) for v in blk.split(","))
        probe(name, int(N), chs, lg == "1", (bz, by, int(N)))
