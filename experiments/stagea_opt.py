"""Stage-A optimization probes, following stagea_profile.py's finding
that the parity-split transpose costs ~5 ms/batch (half of stage A) and
the conv epilogues ~1.7 ms in context:

- full stage A as-is vs epilogue-free (fusion headroom)
- split spelled as (8,B) transpose, as stacked slices, and as a
  fold-channel write (the lane-full floor — not consumable by stage B,
  measures the write-amplification bound)

python experiments/stagea_opt.py >> experiments/stagea_opt.jsonl
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from experiments.stagea_profile import scan_time  # noqa: E402


def main():
    from bench import _flagship
    from flypylib_tpu.ops.packed_conv import (
        _conv,
        pack_volume,
        pack_weight_d1,
    )
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    pm = pspec.module
    dt = pm.dtype
    params = variables["params"]
    B, tin = 16, 76
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, tin, tin, tin, 1), np.float32))

    w0 = pack_weight_d1(params["Conv_0"]["kernel"].astype(dt))
    w1 = pack_weight_d1(params["Conv_1"]["kernel"].astype(dt))
    b0 = jnp.tile(params["Conv_0"]["bias"].astype(dt), 8)
    b1 = jnp.tile(params["Conv_1"]["bias"].astype(dt), 8)

    def convs(x):
        x = pack_volume(x.astype(dt))
        x = jax.nn.relu(_conv(x, w0) + b0)
        return jax.nn.relu(_conv(x, w1) + b1)

    def convs_noep(x):
        x = pack_volume(x.astype(dt))
        return _conv(_conv(x, w0), w1)

    def split_now(x2):
        b_, d, h, w_, c8 = x2.shape
        c = c8 // 8
        y = x2.reshape(b_, d, h, w_, 8, c)
        y = y.transpose(0, 4, 1, 2, 3, 5).reshape(b_ * 8, d, h, w_, c)
        return lax.optimization_barrier(y)

    def split_p_major(x2):
        b_, d, h, w_, c8 = x2.shape
        c = c8 // 8
        y = x2.reshape(b_, d, h, w_, 8, c)
        y = y.transpose(4, 0, 1, 2, 3, 5).reshape(8 * b_, d, h, w_, c)
        return lax.optimization_barrier(y)

    def split_stack(x2):
        c = x2.shape[-1] // 8
        y = jnp.stack(
            [x2[..., p * c:(p + 1) * c] for p in range(8)], axis=1
        )  # (B, 8, d, h, w, c)
        return lax.optimization_barrier(
            y.reshape((-1,) + x2.shape[1:-1] + (c,))
        )

    def split_fold(x2):
        """Lane-full write floor: (B,d,h,8,w*c) — NOT stage-B consumable,
        bounds what a layout-friendly split could cost."""
        b_, d, h, w_, c8 = x2.shape
        c = c8 // 8
        y = x2.reshape(b_, d, h, w_, 8, c)
        y = y.transpose(0, 4, 1, 2, 3, 5)
        return lax.optimization_barrier(
            y.reshape(b_ * 8, d, h, w_ * c)
        )

    variants = {
        "full_now": lambda x: split_now(convs(x)),
        "full_noep": lambda x: split_now(convs_noep(x)),
        "full_p_major": lambda x: split_p_major(convs(x)),
        "full_stack": lambda x: split_stack(convs(x)),
        "full_fold": lambda x: split_fold(convs(x)),
        "convs_only": convs,
    }
    for name, f in variants.items():
        ms = scan_time(f, (x0,)) * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
