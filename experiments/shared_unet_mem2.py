"""AOT memory analysis of the U-Net shared forward's executables.

The split-write shared forward still hit a runtime ResourceExhausted at
the first write_slab dispatch (shared_fwd_ab round 4).  This compiles
fwd_tiles / write_slab / shell-init AOT (no execution) and prints XLA's
own memory_analysis — temp bytes, argument/output bytes, alias success —
to see exactly which executable carries the fat.

python experiments/shared_unet_mem2.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def report(tag, compiled):
    m = compiled.memory_analysis()
    print(json.dumps({
        "tag": tag,
        "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
        "arg_gb": round(m.argument_size_in_bytes / 2**30, 2),
        "out_gb": round(m.output_size_in_bytes / 2**30, 2),
        "alias_gb": round(m.alias_size_in_bytes / 2**30, 2),
        "gen_gb": round(m.generated_code_size_in_bytes / 2**30, 3),
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from flypylib_tpu.infer.large import make_stream_plan
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.packed_unet import packed_unet_spec
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    plan = make_stream_plan(pspec, variables, (1024, 1024, 1024),
                            window=5, threshold=0.99, method="both")
    fp = plan.full_pipe()
    shp = plan._shell_shape()
    print(json.dumps({
        "shell_shape": list(shp),
        "shell_gb": round(4 * float(np.prod(shp)) / 2**30, 2),
        "tile": [fp._tiled.tile_out, fp._tiled.tile_batch],
        "tin": fp._tin,
        "slabs": [[int(zs), list(local.shape)]
                  for zs, local in fp._slabs],
        "padded": list(fp.padded_shape),
    }), flush=True)

    tin = fp._tin
    _, py, px = fp.padded_shape
    win_sd = jax.ShapeDtypeStruct((tin, py, px), jnp.uint8)
    vars_sd = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), variables
    )
    corner_sd3 = jax.ShapeDtypeStruct((3,), jnp.int32)
    report("fwd_tile", fp._fwd_tile.lower(
        vars_sd, win_sd, corner_sd3
    ).compile())

    tout = fp._tiled.tile_out
    shell_sd = jax.ShapeDtypeStruct(shp, jnp.float32)
    probs_sd = jax.ShapeDtypeStruct((tout, tout, tout), jnp.float32)
    off_sd = jax.ShapeDtypeStruct((3,), jnp.int32)
    report("write_tile", fp._write_tile.lower(
        shell_sd, probs_sd, corner_sd3, off_sd
    ).compile())

    report("shell_init", plan._shell_init_fn().lower().compile())
    report("shell_mask", plan._shell_mask_fn().lower(shell_sd).compile())

    # the fused shared postprocess window
    corner_sd = jax.ShapeDtypeStruct((3,), jnp.int32)
    thr_sd = jax.ShapeDtypeStruct((), jnp.float32)
    report("fused_window", plan._fused_shared_fn(plan.C).lower(
        shell_sd, corner_sd, thr_sd
    ).compile())


if __name__ == "__main__":
    main()


def roi_probe():
    """AOT memory analysis of the roi-mode per-ROI covering forward
    (fused unpack+write into the small per-ROI out) for comparison."""
    import jax
    import jax.numpy as jnp

    from flypylib_tpu.infer.large import make_stream_plan
    from flypylib_tpu.models.zoo import unet
    from flypylib_tpu.ops.packed_unet import packed_unet_spec
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec = unet()
    pspec = packed_unet_spec(spec) or spec
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    plan = make_stream_plan(pspec, variables, (1024, 1024, 1024),
                            window=5, threshold=0.99, method="both")
    pipe = plan.pipe
    tin = pipe._tin
    _, py, px = pipe.padded_shape
    zs0, local0 = pipe._slabs[0]
    print(json.dumps({
        "roi_tin": tin, "roi_out": list(pipe._out_shape),
        "roi_local": list(local0.shape), "roi_padded": [py, px],
    }), flush=True)
    vars_sd = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), variables
    )
    slab_sd = jax.ShapeDtypeStruct((tin, py, px), jnp.uint8)
    local_sd = jax.ShapeDtypeStruct(local0.shape, jnp.int32)
    out_sd = jax.ShapeDtypeStruct(pipe._out_shape, jnp.float32)
    off_sd = jax.ShapeDtypeStruct((3,), jnp.int32)
    report("roi_fwd_slab", pipe._fwd_slab.lower(
        vars_sd, slab_sd, local_sd, out_sd, off_sd
    ).compile())


if __name__ == "__main__" and "--roi" in sys.argv:
    roi_probe()
