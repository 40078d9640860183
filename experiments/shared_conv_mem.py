"""AOT memory analysis of the conv-stack SHARED forward at big tiles.

The t128/t176 shared-grid variants hit runtime ResourceExhausted at
1k^3 (shared_tile_sweep) while t64x16 runs at 172.8 Mvox/s.  This
compiles the two-phase slab executables AOT per tile variant and
prints XLA's memory_analysis to find the fat one.

SWEEP_VARIANTS=128x8,176x4 python experiments/shared_conv_mem.py
"""

from __future__ import annotations

import json
import os
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
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import _flagship
    from flypylib_tpu.infer.large import make_stream_plan
    from flypylib_tpu.infer.pipeline import DetectPipeline
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    plan = make_stream_plan(pspec, variables, (1024, 1024, 1024),
                            core=512, window=5, threshold=0.99,
                            method="both")
    shp = plan._shell_shape()
    shell_sd = jax.ShapeDtypeStruct(shp, jnp.float32)
    vars_sd = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), variables
    )
    variants = tuple(
        tuple(int(x) for x in v.split("x"))
        for v in os.environ.get("SWEEP_VARIANTS", "64x16,128x8").split(",")
    )
    for t_out, t_batch in variants:
        fp = DetectPipeline(
            pspec, variables, vol_shape=plan.shape,
            tile_out=t_out, tile_batch=t_batch, window=plan.window,
            threshold=plan.threshold, max_detections=1,
            run_cc=False, pre_padded=True,
        )
        tin = fp._tin
        _, py, px = fp.padded_shape
        zs0, local0 = fp._slabs[0]
        nb = local0.shape[0]
        ch = min(fp._pa_chunk, nb) if fp.two_phase else None
        print(json.dumps({
            "tile": [t_out, t_batch], "tin": tin,
            "two_phase": bool(fp.two_phase),
            "nb_per_slab": int(nb), "pa_chunk": ch,
            "padded_yx": [py, px],
        }), flush=True)
        slab_sd = jax.ShapeDtypeStruct((tin, py, px), jnp.uint8)
        o3 = jax.ShapeDtypeStruct((3,), jnp.int32)
        zi = jax.ShapeDtypeStruct((), jnp.int32)
        if fp.two_phase:
            lc_sd = jax.ShapeDtypeStruct((ch,) + local0.shape[1:],
                                         jnp.int32)
            pa = fp._slab_phase_a.lower(
                vars_sd, slab_sd, o3, zi, lc_sd
            ).compile()
            report(f"t{t_out}b{t_batch}_phase_a", pa)
            # phase-A output shapes via eval_shape on the jitted fn
            xa_sd = jax.eval_shape(
                fp._slab_phase_a, vars_sd, slab_sd, o3, zi, lc_sd
            )
            report(f"t{t_out}b{t_batch}_phase_b", fp._slab_phase_b.lower(
                vars_sd, xa_sd, shell_sd, lc_sd, o3
            ).compile())
        else:
            lc_sd = jax.ShapeDtypeStruct(local0.shape, jnp.int32)
            report(f"t{t_out}b{t_batch}_fwd_slab", fp._fwd_slab.lower(
                vars_sd, slab_sd, lc_sd, shell_sd, o3
            ).compile())


if __name__ == "__main__":
    main()
