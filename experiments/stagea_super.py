"""Probe the two pieces of supertile stage-A sharing (compute stage A
once per 2x2 y/x tile group, stage B reads per-tile windows):

1. pack+conv1+conv2 at the supertile shape (B=4 supertiles of
   140x140 y/x, z=76 -> packed (38,70,70)) vs today's 16 single tiles
   (38^3) — same output voxels, 22% fewer input voxels in y/x halos.
2. split+stage-B consuming lax.dynamic_slice windows of a superblock
   xa vs a materialized per-tile xa (does the slice poison the conv?).

python experiments/stagea_super.py >> experiments/stagea_super.jsonl
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
    rng = np.random.default_rng(0)

    w0 = pack_weight_d1(params["Conv_0"]["kernel"].astype(dt))
    w1 = pack_weight_d1(params["Conv_1"]["kernel"].astype(dt))
    w3 = params["Conv_2"]["kernel"].astype(dt)
    b3 = params["Conv_2"]["bias"].astype(dt)

    def convs(x):
        x = pack_volume(x.astype(dt))
        return _conv(_conv(x, w0), w1)

    # --- piece 1: stage-A convs at tile vs supertile shape ------------
    x_tiles = jnp.asarray(
        rng.random((16, 76, 76, 76, 1), np.float32)
    )
    x_super = jnp.asarray(
        rng.random((4, 76, 140, 140, 1), np.float32)
    )
    ms_t = scan_time(convs, (x_tiles,)) * 1e3
    ms_s = scan_time(convs, (x_super,)) * 1e3
    out_vox = 16 * 36**3  # identical stage-B-consumable voxels per form
    print(json.dumps({
        "name": "stageA_convs", "tiles_ms": round(ms_t, 3),
        "super_ms": round(ms_s, 3),
        "in_vox_ratio": round(4 * 140 * 140 * 76 / (16 * 76**3), 3),
    }), flush=True)

    # --- piece 2: stage B from sliced windows vs materialized xa ------
    lat, c = 36, 32
    xa = jnp.asarray(
        rng.standard_normal((128, lat, lat, lat, c)).astype(np.float32)
    ).astype(dt)
    # superblock xa: (32, 36, 68, 68, c) = 4 supertiles x 8 parities,
    # each holding a 2x2 window grid at y/x offsets {0, 32}
    xs = jnp.asarray(
        rng.standard_normal((32, lat, 68, 68, c)).astype(np.float32)
    ).astype(dt)

    def l3(x):
        return jax.nn.relu(
            lax.conv_general_dilated(
                x, w3, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ) + b3
        )

    def from_dense(xa):
        return l3(xa)

    def from_slices(xs):
        outs = []
        for oy in (0, 32):
            for ox in (0, 32):
                win = lax.dynamic_slice(
                    xs, (0, 0, oy, ox, 0), (32, lat, lat, lat, c)
                )
                outs.append(l3(win))
        return jnp.concatenate(outs, axis=0)

    def from_slices_barrier(xs):
        outs = []
        for oy in (0, 32):
            for ox in (0, 32):
                win = lax.optimization_barrier(lax.dynamic_slice(
                    xs, (0, 0, oy, ox, 0), (32, lat, lat, lat, c)
                ))
                outs.append(l3(win))
        return jnp.concatenate(outs, axis=0)

    for name, f, a in (
        ("L3_from_dense_xa", from_dense, (xa,)),
        ("L3_from_sliced_superblock", from_slices, (xs,)),
        ("L3_from_sliced_barrier", from_slices_barrier, (xs,)),
    ):
        ms = scan_time(f, a) * 1e3
        print(json.dumps({"name": name, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
