"""Full-forward A/B of the decoder fold forms (VERDICT r05 / r04 item 1).

``fold_form="split"`` consumes the PRE-concat skip + upsampled tensors
with two convs summed — the XLA-level member of the "native layouts, no
boundary concat" family the round-7b rejection pointed at (the Pallas
members must fuse the concat in-VMEM; this one never builds it at all).

python experiments/unet_fold_split_ab.py [tin ...]   (default 388 428)
"""

from __future__ import annotations

import json
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

OUT = "experiments/unet_fold_split_ab.jsonl"


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
        # force a real roundtrip (block_until_ready is unreliable
        # through the tunnel — CLAUDE.md)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    tins = [int(a) for a in sys.argv[1:]] or [388, 428]
    spec = unet()
    rng = np.random.default_rng(0)
    small = spec.min_size
    variables = spec.module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, small, small, small, 1), jnp.float32), train=False,
    )
    diff = jax.jit(
        lambda a, b: jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)
        ).max()
    )
    for tin in tins:
        x = jnp.asarray(
            rng.standard_normal((1, tin, tin, tin, 1)).astype(np.float32)
        )
        vox = (tin - 2 * spec.context) ** 3
        ref = None
        for ff in ("concat", "split", "split0"):
            pm = PackedUNet(spec.module, fold_form=ff)
            fwd = jax.jit(lambda v, x, pm=pm: pm.apply(v, x))
            t0 = time.perf_counter()
            out = fwd(variables, x)
            row = {"tin": tin, "fold_form": ff,
                   "compile_s": round(time.perf_counter() - t0, 1)}
            if ref is None:
                ref = out
                row["ref_scale"] = float(jnp.abs(ref).max())
            else:
                row["max_diff"] = float(diff(out, ref))
                del out
            emit(row)
            dt = timeit(lambda x, fwd=fwd: fwd(variables, x), x)
            emit({"tin": tin, "fold_form": ff, "ms": round(dt * 1e3, 2),
                  "mvox_s": round(vox / dt / 1e6, 1)})


if __name__ == "__main__":
    main()
