"""Fused Pallas decoder-tail kernel vs lax reference (interpret mode on
CPU; TPU timings in experiments/pallas_tail_bench.jsonl).

The kernel reproduces the XLA path's rounding points (f32 tap
accumulation -> model dtype -> bias -> ReLU per stage); the only
difference is the ORDER of the f32 tap accumulation, which can flip
the final bf16 rounding by 1 ulp on a handful of values (measured
~0.05% of elements at unit scale, 0 at 0.1 scale).  Tests therefore
assert a 2-ulp-bf16 tolerance, and exact equality where no rounding
boundary is near (zero-weight probes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.ops.pallas_tail import packed_tail, tail_reference


def _mk(rng, shape, dt=jnp.bfloat16, scale=0.1):
    return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32), dt)


@pytest.mark.parametrize(
    "shape,chans,block",
    [
        ((12, 13, 14), (24, 32, 32), (4, 8, 8)),
        ((10, 10, 18), (8, 16, 8), (4, 4, 8)),   # partial edge blocks
        ((9, 9, 9), (8, 8, 8), (16, 16, 16)),    # block larger than out
    ],
)
def test_chain_with_logits_matches_lax(rng, shape, chans, block):
    c0, c1, c2 = chans
    x = _mk(rng, (*shape, c0), scale=1.0)
    stages = [
        (_mk(rng, (2, 2, 2, c0, c1)), _mk(rng, (c1,))),
        (_mk(rng, (2, 2, 2, c1, c2)), _mk(rng, (c2,))),
    ]
    wl = _mk(rng, (c2, 16))
    bl = jnp.asarray(rng.normal(0, 1, 8).astype(np.float32))
    got = packed_tail(x, stages, (wl, bl), block=block, interpret=True)
    ref = tail_reference(x, stages, (wl, bl))
    assert got.shape == ref.shape and got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_chain_without_logits_matches_lax(rng):
    x = _mk(rng, (11, 12, 13, 16), scale=1.0)
    stages = [
        (_mk(rng, (2, 2, 2, 16, 24)), _mk(rng, (24,))),
        (_mk(rng, (2, 2, 2, 24, 16)), _mk(rng, (16,))),
        (_mk(rng, (2, 2, 2, 16, 8)), _mk(rng, (8,))),
    ]
    got = packed_tail(x, stages, None, block=(4, 8, 8), interpret=True)
    ref = tail_reference(x, stages, None)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_single_stage(rng):
    x = _mk(rng, (6, 7, 8, 8), scale=1.0)
    stages = [(_mk(rng, (2, 2, 2, 8, 8)), _mk(rng, (8,)))]
    got = packed_tail(x, stages, None, block=(4, 4, 4), interpret=True)
    ref = tail_reference(x, stages, None)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_bad_kernel_shape_raises(rng):
    x = _mk(rng, (8, 8, 8, 8))
    with pytest.raises(ValueError):
        packed_tail(x, [(_mk(rng, (3, 3, 3, 8, 8)), _mk(rng, (8,)))],
                    interpret=True)


def test_too_small_input_raises(rng):
    x = _mk(rng, (2, 8, 8, 8))
    stages = [(_mk(rng, (2, 2, 2, 8, 8)), _mk(rng, (8,)))] * 2
    with pytest.raises(ValueError):
        packed_tail(x, stages, interpret=True)


def test_bad_logits_shape_raises(rng):
    x = _mk(rng, (8, 8, 8, 8))
    stages = [(_mk(rng, (2, 2, 2, 8, 8)), _mk(rng, (8,)))]
    with pytest.raises(ValueError):
        packed_tail(x, stages, (_mk(rng, (8, 12)),
                                jnp.zeros(8, jnp.float32)), interpret=True)
