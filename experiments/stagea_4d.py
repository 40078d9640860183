"""Probe: delete the parity-split transpose by running stage B as
4-spatial-dim convs with parity as a kernel-size-1 spatial axis.

conv2's packed output (B,d,h,w,8c) reshapes FREELY (minor split) to
(B,d,h,w,8,c); a conv with spatial dims (d,h,w,p) and kernel (3,3,3,1)
connects only equal-parity voxels — exactly the parity-batched stage-B
semantics with NO transpose.  If XLA lowers this at the batched-conv
rate, the ~5 ms/batch split (21% of the forward) disappears.

Measures, at the production (16-tile, tin 76) batch shape:
  - split + L3 batched (today's path)
  - free-reshape + L3 as 4-D conv
  - full stage-B chain both ways (L3+L4+head+logits+merge-equivalent)
and checks numerical equality.

python experiments/stagea_4d.py >> experiments/stagea_4d.jsonl
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from experiments.stagea_profile import scan_time  # noqa: E402

DIMS4 = lax.ConvDimensionNumbers(
    lhs_spec=(0, 5, 1, 2, 3, 4),   # N, C, spatial (d, h, w, p)
    rhs_spec=(5, 4, 0, 1, 2, 3),   # O, I, spatial
    out_spec=(0, 5, 1, 2, 3, 4),
)


def conv4(x6, w6):
    """x6 (B,d,h,w,8,c) * w6 (3,3,3,1,ci,co) -> (B,d',h',w',8,co)."""
    return lax.conv_general_dilated(
        x6, w6, (1, 1, 1, 1), "VALID", dimension_numbers=DIMS4,
        preferred_element_type=None,
    )


def conv3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def main():
    from bench import _flagship
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    pm = pspec.module
    dt = pm.dtype
    params = variables["params"]
    rng = np.random.default_rng(0)
    B, lat, c = 16, 36, 32
    # conv2 output stand-in: packed parity-major channels
    x2 = jnp.asarray(
        rng.standard_normal((B, lat, lat, lat, 8 * c)).astype(np.float32)
    ).astype(dt)

    w3 = params["Conv_2"]["kernel"].astype(dt)   # (3,3,3,32,48)
    b3 = params["Conv_2"]["bias"].astype(dt)
    w4 = params["Conv_3"]["kernel"].astype(dt)   # (3,3,3,48,64)
    b4 = params["Conv_3"]["bias"].astype(dt)
    wh = params["Conv_4"]["kernel"].astype(dt)   # (1,1,1,64,96)
    bh = params["Conv_4"]["bias"].astype(dt)

    def split(x):
        b_, d, h, w_, c8 = x.shape
        cc = c8 // 8
        y = x.reshape(b_, d, h, w_, 8, cc)
        y = y.transpose(0, 4, 1, 2, 3, 5).reshape(b_ * 8, d, h, w_, cc)
        return lax.optimization_barrier(y)

    def batched_l3(x):
        return jax.nn.relu(conv3(split(x), w3) + b3)

    def chain_batched(x):
        y = jax.nn.relu(conv3(split(x), w3) + b3)
        y = jax.nn.relu(conv3(y, w4) + b4)
        return jax.nn.relu(conv3(y, wh) + bh)

    w3_6 = w3[:, :, :, None]  # (3,3,3,1,32,48)
    w4_6 = w4[:, :, :, None]
    wh_6 = wh[:, :, :, None]  # (1,1,1,1,64,96)

    def reshape6(x):
        b_, d, h, w_, c8 = x.shape
        return x.reshape(b_, d, h, w_, 8, c8 // 8)

    def p4_l3(x):
        return jax.nn.relu(conv4(reshape6(x), w3_6) + b3)

    def chain_p4(x):
        y = jax.nn.relu(conv4(reshape6(x), w3_6) + b3)
        y = jax.nn.relu(conv4(y, w4_6) + b4)
        return jax.nn.relu(conv4(y, wh_6) + bh)

    # correctness: p4 == batched (modulo the parity<->batch reshape)
    a = np.asarray(jax.device_get(batched_l3(x2)), np.float32)
    b6 = np.asarray(jax.device_get(p4_l3(x2)), np.float32)
    # batched layout: (B*8, d,h,w,c) with index b*8+p; p4: (B,d,h,w,8,c)
    b_cmp = np.moveaxis(b6, 4, 1).reshape(a.shape)
    same = bool(np.array_equal(a, b_cmp))
    print(json.dumps({"l3_bitwise_equal": same,
                      "max_abs_diff": float(np.max(np.abs(a - b_cmp)))}),
          flush=True)

    for name, f in (
        ("split+L3_batched", batched_l3),
        ("reshape+L3_p4", p4_l3),
        ("split+chain_batched", chain_batched),
        ("reshape+chain_p4", chain_p4),
    ):
        ms = scan_time(f, (x2,)) * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
