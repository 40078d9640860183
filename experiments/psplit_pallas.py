"""A/B the Pallas parity-split relayout kernel against the production
XLA transpose at the t64b16 stage-A boundary shape (16, 36^3, 256)
bf16 — the 4.8 ms / 21%-of-forward line item (BENCH_NOTES rounds 5,
7a: relayout-op-bound; floor ~2.3 ms at HBM speed for the same padded
bytes).

Also times the kernel inside the full phase A (stage-A convs + pallas
split) vs production apply_stage_a, as separate-dispatch production
geometry.

python experiments/psplit_pallas.py >> experiments/psplit_pallas.jsonl
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

from experiments.stageb_psplit import scan_time  # noqa: E402


def main():
    from bench import _flagship
    from flypylib_tpu.ops.pallas_split import (
        parity_split_pallas,
        parity_split_xla,
    )
    from flypylib_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pspec, variables = _flagship()
    pm = pspec.module
    rng = np.random.default_rng(0)
    B, cells, c8 = 16, 36, 256
    x = jnp.asarray(
        rng.random((B, cells, cells, cells, c8), np.float32)
    ).astype(pm.dtype)

    out = {"shape": list(x.shape), "dtype": str(x.dtype)}

    f_xla = jax.jit(parity_split_xla)
    ref = np.asarray(f_xla(x)[:2, :2, :2, :2, :2])
    # NB a standalone scan-timed XLA transpose is meaningless: feeding
    # it straight into the scan's jnp.sum lets XLA delete the relayout
    # (measured 0.0 ms) — the honest XLA anchor is the in-context
    # phase-A delta (~5 ms; BENCH_NOTES round 5)
    for variant in ("hbm",):
        f_pl = jax.jit(
            functools.partial(parity_split_pallas, variant=variant)
        )
        t0 = time.perf_counter()
        got = np.asarray(f_pl(x)[:2, :2, :2, :2, :2])
        out[f"{variant}_compile_s"] = round(time.perf_counter() - t0, 1)
        np.testing.assert_array_equal(got, ref)
        out[f"{variant}_ms"] = round(
            scan_time(lambda x, f=f_pl: f(x), (x,)) * 1e3, 3
        )

    # full phase A with each split spelling (production geometry: one
    # dispatch ending at the boundary barrier)
    tin = 76
    x0 = jnp.asarray(rng.random((B, tin, tin, tin, 1), np.float32))

    def phase_a_pallas(xv, variant):
        from jax import lax

        from flypylib_tpu.ops.packed_conv import (
            pack_volume,
            pack_weight_d1,
        )

        dt = pm.dtype
        params = variables["params"]
        xp = pack_volume(xv.astype(dt))
        for i in range(pm.n_lead):
            w = params[f"Conv_{i}"]["kernel"].astype(dt)
            xp = lax.conv_general_dilated(
                xp, pack_weight_d1(w), (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            xp = pm._epilogue(variables, xp, i, dt)
        return lax.optimization_barrier(
            parity_split_pallas(xp, variant=variant)
        )

    out["phase_a_xla_ms"] = round(
        scan_time(lambda xv: pm.apply_stage_a(variables, xv), (x0,)) * 1e3, 3
    )
    for variant in ("hbm",):
        out[f"phase_a_{variant}_ms"] = round(
            scan_time(
                lambda xv, v=variant: phase_a_pallas(xv, v), (x0,)
            ) * 1e3, 3,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
