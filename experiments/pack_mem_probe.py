"""AOT temp-memory probe of pack/unpack primitives at U-Net 1k^3 tile
shapes — isolates which data-movement op carries the multi-GB padded
layout copy (shared_unet_mem2 follow-up).

python experiments/pack_mem_probe.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from flypylib_tpu.ops.packed_conv import (
        pack_volume,
        unpack_volume,
        unpack_volume_iv,
    )
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    def rep(tag, fn, *sds):
        c = jax.jit(fn).lower(*sds).compile()
        m = c.memory_analysis()
        print(json.dumps({
            "tag": tag,
            "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
            "arg_gb": round(m.argument_size_in_bytes / 2**30, 2),
            "out_gb": round(m.output_size_in_bytes / 2**30, 2),
        }), flush=True)

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    S = jax.ShapeDtypeStruct
    rep("pack_388_f32", pack_volume, S((1, 388, 388, 388, 1), f32))
    rep("pack_388_bf16", pack_volume, S((1, 388, 388, 388, 1), bf16))
    rep("unpack_174_c1", unpack_volume, S((1, 174, 174, 174, 8), f32))
    rep("unpack_iv_174_c1", unpack_volume_iv,
        S((1, 174, 174, 174, 8), f32))
    rep("unpack_iv_174_c1_bf16", unpack_volume_iv,
        S((1, 174, 174, 174, 8), bf16))
    # decoder-level unpacks (bigger channel counts, smaller spatial)
    rep("unpack_iv_91_c24", unpack_volume_iv,
        S((1, 91, 91, 91, 192), bf16))
    rep("unpack_91_c24", unpack_volume, S((1, 91, 91, 91, 192), bf16))
    # pack as used inside the training engine at patch shapes
    rep("pack_48_bf16", pack_volume, S((32, 48, 48, 48, 1), bf16))


if __name__ == "__main__":
    main()


def probe_pack_iv():
    import jax
    import jax.numpy as jnp

    from flypylib_tpu.ops.packed_conv import pack_volume_iv
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    S = jax.ShapeDtypeStruct
    for tag, sd in (
        ("pack_iv_388_f32", S((1, 388, 388, 388, 1), jnp.float32)),
        ("pack_iv_388_bf16", S((1, 388, 388, 388, 1), jnp.bfloat16)),
    ):
        c = jax.jit(pack_volume_iv).lower(sd).compile()
        m = c.memory_analysis()
        print(json.dumps({
            "tag": tag,
            "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
        }), flush=True)


if __name__ == "__main__" and "--iv" in sys.argv:
    probe_pack_iv()
