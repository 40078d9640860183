"""Bisect the FAILED_PRECONDITION in the U-Net shared forward: run each
dispatch class with a forced sync between, so the aborting executable
names itself.

python experiments/shared_unet_bisect.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_volume_u8
    from flypylib_tpu.infer.large import (
        make_stream_plan,
        stage_volume_chunked,
    )
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.packed_unet import packed_unet_spec
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    def sync(tag, x):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(x.ravel()[:1]))
        print(json.dumps({
            "ok": tag, "s": round(time.perf_counter() - t0, 2),
        }), flush=True)

    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    vol = make_volume_u8(1024, n_blobs=128)
    plan = make_stream_plan(pspec, variables, vol.shape,
                            window=5, threshold=0.9, method="both")
    staged = stage_volume_chunked(vol, plan=plan)
    sync("staged", staged.chunks[-1])
    fp = plan.full_pipe(staged_bytes=vol.size)
    tin = fp._tin
    off = staged.halo - plan.ctx
    print(json.dumps({
        "tile": [fp._tiled.tile_out, fp._tiled.tile_batch],
        "tin": tin, "n_slabs": len(fp._slabs),
        "shell": list(plan._shell_shape()),
    }), flush=True)

    shell = plan._shell_init_fn()()
    sync("shell_init", shell)

    zs0, local0 = fp._slabs[0]
    corners = np.asarray(local0).reshape(-1, 3)
    h = plan.h
    zero3 = jnp.zeros((3,), jnp.int32)
    for i, c in enumerate(corners[:3]):
        w = staged.window(
            (off + zs0 + int(c[0]), off + int(c[1]), off + int(c[2])),
            (tin, tin, tin),
        )
        sync(f"window_{i}", w)
        probs = fp._fwd_tile(fp.variables, w, zero3)
        sync(f"fwd_tile_{i}", probs)
        shell = fp._write_tile(
            shell, probs,
            jnp.asarray(
                (h + zs0 + int(c[0]), h + int(c[1]), h + int(c[2])),
                jnp.int32,
            ),
            zero3,
        )
        sync(f"write_tile_{i}", shell)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
