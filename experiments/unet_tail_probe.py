"""Cost of the packed U-Net's FINAL unpack at tin 388, in-chain.

After logits_bd (unet_fold_probe) the logits stage still carries the
final (1,174^3,8) -> (1,348^3) de-interleave, whose per-axis stacks run
at 4- and 2-wide minor dims (heavily lane-padded intermediates).
Variants (all downstream of the same full forward):

  none : stop at y (cells, 8) — lower bound, quantifies the unpack
  iv   : unpack_volume_iv (production)
  xp   : one-shot 8-D transpose (unpack_volume)
  du   : pad y to (..., 128) lanes with a dot against a (8, 8) eye
         embedded in (8,128)?  -- NOT tried; instead:
  b16  : unpack in bf16, cast to f32 after (halves stack traffic;
         bf16<->f32 casts of probs are NOT value-exact so this is a
         measurement probe only, to see if the cost is bandwidth)

python experiments/unet_tail_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import unpack_volume, unpack_volume_iv
from flypylib_tpu.ops.packed_unet import PackedUNet, packed_unet_spec
from flypylib_tpu.utils.cache import enable_compilation_cache


def timeit(fn, args, iters=8, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def many(args, n):
        def body(acc, i):
            first = args[0] + i.astype(args[0].dtype)
            out = fn(first, *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    float(many(args, n=1))
    float(many(args, n=iters))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(args, n=iters))
        tn = time.perf_counter() - t0
        best = min(best, tn / iters)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm: PackedUNet = pspec.module
    tin = 388
    variables = spec.init(jax.random.PRNGKey(0), pspec.min_size)
    tiles = jnp.asarray(rng.integers(0, 255, (1, tin, tin, tin)), jnp.uint8)
    tout = tin - 2 * pspec.context
    out_vox = tout ** 3

    # monkeypatchable final stage: reuse the production forward but swap
    # the last unpack by patching unpack hooks is brittle; instead call
    # _forward and re-derive y by re-packing its output is wasteful.
    # Simplest faithful approach: copy the production forward's tail
    # isn't needed — the final unpack consumes ONLY y, so time
    # full_forward (prod) vs a forward that returns the PRE-unpack
    # tensor, reconstructed by packing the output back would double
    # count.  We patch flypylib_tpu.ops.packed_unet.unpack_volume_iv's
    # LAST call via a module-level switch instead: the module calls
    # unpack_volume_iv in 3 places; the final one takes an 8-channel
    # input, so dispatch on channel count.
    import flypylib_tpu.ops.packed_unet as pu

    orig = pu.unpack_volume_iv
    mode = {"final": "iv"}

    def patched(x):
        if x.shape[-1] == 8:  # the final logits unpack (c=1)
            m = mode["final"]
            if m == "none":
                return x
            if m == "xp":
                return unpack_volume(x)
            if m == "b16":
                return orig(x.astype(jnp.bfloat16)).astype(jnp.float32)
        return orig(x)

    pu.unpack_volume_iv = patched
    try:
        def fwd(t):
            x = (t.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            return pm._forward(variables, x)

        open("experiments/unet_tail_probe.jsonl", "w").close()
        for m in ["iv", "none", "xp", "b16"]:
            mode["final"] = m
            dtm = timeit(fwd, (tiles,))
            row = {
                "final_unpack": m,
                "ms": round(dtm * 1e3, 2),
                "tile_mvox_s": round(out_vox / dtm / 1e6, 1),
            }
            print(json.dumps(row), flush=True)
            with open("experiments/unet_tail_probe.jsonl", "a") as fh:
                fh.write(json.dumps(row) + "\n")
    finally:
        pu.unpack_volume_iv = orig


if __name__ == "__main__":
    main()
