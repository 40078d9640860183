"""Pallas relayout kernel for the stage-A parity split.

The packed ConvStack's stage-A -> stage-B boundary reorders the packed
(B, d, h, w, 8c) activation into 8 parity-batched lattices
(8B, d, h, w, c).  XLA's transpose emitter moves the ~1.9 GB of
physical bytes per 16-tile batch (the c=32 destination lane-pads 4x)
at ~400 GB/s effective — 4.8 ms, ~21% of the whole forward, and every
XLA-level respelling measured WORSE (BENCH_NOTES rounds 5 and 7a: the
cost is the relayout op itself, not the padded write bytes — a dense
destination does not help, and grouped-conv consumers lose more).
STATUS: measured-and-REJECTED (BENCH_NOTES round 7c) — kept as the
documented negative result closing the axis.  Of four formulations,
only the per-plane channel-slice store compiles, and it LOSES to the
XLA transpose in context (phase A 11.88 vs 10.24 ms; 6.72 ms
standalone vs ~5 effective): Mosaic serializes the 8 lane-offset
shuffles.  The ~2.3 ms HBM floor is unreachable because every
alternative trips an alignment wall at the odd (36^3) production
extents — single-store moveaxis ("unsupported shape cast"), 32-lane
BlockSpec windows (lane blocks must be 128-divisible or full), and
HBM->HBM strided DMA ("slice shape along dim 3 must be aligned to
tiling (8)").  Production keeps the XLA spelling.

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
        # one store: let Mosaic schedule the whole shuffle at once.
        # REJECTED: Mosaic "infer-vector-layout: unsupported shape
        # cast" on the lane-dim reshape (psplit_pallas.jsonl).
        h, w = x_ref.shape[2], x_ref.shape[3]
        x = x_ref[0, 0].reshape(h, w, 8, c)
        out_ref[0, :, 0] = jnp.moveaxis(x, 2, 0)
    else:
        raise ValueError(variant)


def _split_kernel_dma(x_ref, out_ref):
    # pure copy: the grid's parity axis selects a 32-lane input window,
    # so the HBM->VMEM DMA does the gather and the kernel never
    # shuffles lanes.  x_ref: (1, ZB, H, W, c); out_ref: (1, 1, ZB, H, W, c).
    # REJECTED: Pallas TPU refuses lane-dim blocks that are not
    # 128-divisible or full (32 of 256 is neither).
    out_ref[0, 0] = x_ref[0]


def _split_kernel_hbm(x_ref, out_ref, sems, *, c: int):
    # HBM->HBM DMA orchestration: one program per batch element issues 8
    # strided copies (one per parity channel-slice) straight between the
    # HBM tensors — no VMEM residency, no lane shuffles; the copy engine
    # does the element-granular gather the BlockSpec pipeline refuses.
    i = pl.program_id(0)

    def copy(p):
        return pltpu.make_async_copy(
            x_ref.at[i, :, :, :, pl.ds(p * c, c)],
            out_ref.at[i, p],
            sems.at[p],
        )

    for p in range(8):
        copy(p).start()
    for p in range(8):
        copy(p).wait()


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def parity_split_pallas(x: jax.Array, interpret: bool = False,
                        variant: str = "slices") -> jax.Array:
    """(B, d, h, w, 8c) -> (8B, d, h, w, c); batch-major/parity-minor.

    Drop-in for the production split spelling in
    :meth:`flypylib_tpu.ops.packed_conv.PackedConvStack.apply_stage_a`.
    """
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    cost = pl.CostEstimate(
        flops=0,
        bytes_accessed=2 * x.size * x.dtype.itemsize,
        transcendentals=0,
    )

    if variant == "hbm":
        out = pl.pallas_call(
            functools.partial(_split_kernel_hbm, c=c),
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((b, 8, d, h, w, c), x.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
            cost_estimate=cost,
            interpret=interpret,
        )(x)
        return out.reshape(8 * b, d, h, w, c)

    if variant == "dma":
        # z-chunk so one program's in+out VMEM stays ~small
        zb = d
        while zb > 1 and zb * h * w * c * x.dtype.itemsize > (3 << 20):
            zb -= 1
        while d % zb:
            zb -= 1
        out = pl.pallas_call(
            _split_kernel_dma,
            grid=(b, d // zb, 8),
            in_specs=[
                pl.BlockSpec(
                    (
                        pl.Element(1),
                        pl.Element(zb),
                        pl.Element(h),
                        pl.Element(w),
                        pl.Element(c),
                    ),
                    lambda i, j, k: (i, j * zb, 0, 0, k * c),
                )
            ],
            out_specs=pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(1),
                    pl.Element(zb),
                    pl.Element(h),
                    pl.Element(w),
                    pl.Element(c),
                ),
                lambda i, j, k: (i, k, j * zb, 0, 0, 0),
            ),
            out_shape=jax.ShapeDtypeStruct((b, 8, d, h, w, c), x.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(x)
        return out.reshape(8 * b, d, h, w, c)

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
        cost_estimate=cost,
        interpret=interpret,
    )(x)
    return out.reshape(8 * b, d, h, w, c)


def parity_split_xla(x: jax.Array) -> jax.Array:
    """The production XLA spelling (reference for tests/A-B)."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    y = x.reshape(b, d, h, w, 8, c)
    return y.transpose(0, 4, 1, 2, 3, 5).reshape(8 * b, d, h, w, c)
