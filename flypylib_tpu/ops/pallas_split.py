"""Pallas relayout kernel for the stage-A parity split.

The packed ConvStack's stage-A -> stage-B boundary reorders the packed
(B, d, h, w, 8c) activation into 8 parity-batched lattices
(8B, d, h, w, c).  XLA's transpose emitter moves the ~1.9 GB of
physical bytes per 16-tile batch (the c=32 destination lane-pads 4x)
at ~400 GB/s effective — 4.8 ms, ~21% of the whole forward, and every
XLA-level respelling measured WORSE (BENCH_NOTES rounds 5 and 7a: the
cost is the relayout op itself, not the padded write bytes — a dense
destination does not help, and grouped-conv consumers lose more).
This kernel is the remaining lever: a hand relayout that streams one
(h, w, 8c) plane per grid step through VMEM and stores the 8 parity
channel-slices directly, targeting HBM speed (~2.3 ms for the same
bytes).

Semantics: ``parity_split_pallas(x)`` == the production spelling

    x.reshape(b, d, h, w, 8, c).transpose(0, 4, 1, 2, 3, 5)
     .reshape(8 * b, d, h, w, c)

bit-exactly (a pure copy — no arithmetic), pinned by
tests/test_pallas_split.py against the XLA form on both backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_kernel(x_ref, out_ref, *, c: int, variant: str):
    # x_ref: (1, 1, H, W, 8c) one z-plane of one batch element;
    # out_ref: (1, 8, 1, H, W, c) the 8 parity slices of that plane
    # (batch-major / parity-minor, matching the production transpose).
    if variant == "slices":
        for p in range(8):
            out_ref[0, p, 0] = x_ref[0, 0, :, :, p * c : (p + 1) * c]
    elif variant == "moveaxis":
        # one store: let Mosaic schedule the whole shuffle at once
        h, w = x_ref.shape[2], x_ref.shape[3]
        x = x_ref[0, 0].reshape(h, w, 8, c)
        out_ref[0, :, 0] = jnp.moveaxis(x, 2, 0)
    else:
        raise ValueError(variant)


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def parity_split_pallas(x: jax.Array, interpret: bool = False,
                        variant: str = "slices") -> jax.Array:
    """(B, d, h, w, 8c) -> (8B, d, h, w, c); batch-major/parity-minor.

    Drop-in for the production split spelling in
    :meth:`flypylib_tpu.ops.packed_conv.PackedConvStack.apply_stage_a`.
    """
    b, d, h, w, c8 = x.shape
    c = c8 // 8

    grid = (b, d)
    out = pl.pallas_call(
        functools.partial(_split_kernel, c=c, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(1),
                    pl.Element(h),
                    pl.Element(w),
                    pl.Element(c8),
                ),
                lambda i, j: (i, j, 0, 0, 0),
            )
        ],
        out_specs=pl.BlockSpec(
            (
                pl.Element(1),
                pl.Element(8),
                pl.Element(1),
                pl.Element(h),
                pl.Element(w),
                pl.Element(c),
            ),
            lambda i, j: (i, 0, j, 0, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, d, h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return out.reshape(8 * b, d, h, w, c)


def parity_split_xla(x: jax.Array) -> jax.Array:
    """The production XLA spelling (reference for tests/A-B)."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    y = x.reshape(b, d, h, w, 8, c)
    return y.transpose(0, 4, 1, 2, 3, 5).reshape(8 * b, d, h, w, c)
