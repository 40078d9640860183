"""Fused Pallas conv3d + bias + ReLU kernel (north star [B:5]).

A valid 3x3x3 (optionally dilated) convolution over an NDHWC volume,
expressed the MXU-friendly way: for each output z-plane, the 27 taps
collapse into 9 matmuls of shape (BY*W, 3*Ci) @ (3*Ci, Co) — the three
z-taps are packed into the contraction dimension, and the (dy, dx) spatial
shifts become *row offsets* into the flattened (y, x) plane (zero-copy:
plane rows are contiguous in VMEM).  Bias add + ReLU fuse into the
accumulator epilogue, so one HBM round-trip covers what XLA's
conv + broadcast + max would do in several.

Blocking: grid over (z, y) output blocks with overlapping halo input
windows via ``pl.Element`` block dims (Pallas pipelines the HBM->VMEM
copies automatically).  Partial edge blocks shift the window inward —
duplicate writes of identical values, the same valid-conv trick the tile
engine uses.

Correctness is pinned against ``lax.conv_general_dilated`` in
tests/test_pallas_conv.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, BZ, BY, W, Ci, Co, d,
                 im2col):
    BZS, BYS = BZ + 2 * d, BY + 2 * d
    OW = W - 2 * d

    bias = b_ref[...].reshape(1, Co).astype(jnp.float32)
    if im2col:
        # weights laid out to match the lhs K order below:
        # [(dy, dx) blocks] x [dz] x [ci]
        rhs_full = jnp.transpose(w_ref[...], (1, 2, 0, 3, 4)).reshape(
            27 * Ci, Co
        )
    else:
        rhs = [
            [w_ref[:, dy, dx].reshape(3 * Ci, Co) for dx in range(3)]
            for dy in range(3)
        ]

    # 2d zero tail rows: the dx row-shift reads up to 2d rows past the
    # plane end (positions cropped from the output)
    tail = jnp.zeros((2 * d, Ci), x_ref.dtype)
    for bz in range(BZ):
        # ONE channel-concat of the three z-planes per output plane; the 9
        # (dy, dx) taps reuse it as zero-copy row slices
        base = jnp.concatenate(
            [
                jnp.concatenate(
                    [x_ref[bz + dz * d].reshape(BYS * W, Ci), tail]
                )
                for dz in range(3)
            ],
            axis=1,
        )
        if im2col:
            # full im2col: K = 27*Ci in ONE matmul — far better MXU
            # contraction utilization than nine K=3*Ci matmuls.  Row
            # shifts use pltpu.roll so every concat operand sits at
            # sublane offset 0 (Mosaic rejects concats of slices with
            # mismatched non-concat-dim offsets); the circular wraparound
            # lands in rows beyond BY*W, which are never read.
            def build_and_dot(scr):
                for k, (dy, dx) in enumerate(
                    (dy, dx) for dy in range(3) for dx in range(3)
                ):
                    off = dy * d * W + dx * d
                    scr[:, k * 3 * Ci : (k + 1) * 3 * Ci] = base[
                        off : off + BY * W
                    ]
                return jnp.dot(
                    scr[:], rhs_full, preferred_element_type=jnp.float32
                )

            acc = pl.run_scoped(
                build_and_dot,
                pltpu.VMEM((BY * W, 27 * Ci), base.dtype),
            )
        else:
            acc = jnp.zeros((BY * W, Co), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    off = dy * d * W + dx * d
                    acc += jnp.dot(
                        base[off : off + BY * W],
                        rhs[dy][dx],
                        preferred_element_type=jnp.float32,
                    )
        res = jnp.maximum(acc + bias, 0.0).astype(out_ref.dtype)
        out_ref[bz] = res.reshape(BY, W, Co)[:, :OW]


@functools.partial(
    jax.jit, static_argnames=("dilation", "block", "interpret", "im2col")
)
def conv3d_bias_relu(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    dilation: int = 1,
    block: tuple[int, int] = (8, 8),
    interpret: bool = False,
    im2col: bool = True,
) -> jax.Array:
    """Fused valid conv3d(3x3x3, dilated) + bias + ReLU.

    x: (D, H, W, Ci) bf16/f32; w: (3, 3, 3, Ci, Co); b: (Co,).
    Returns (D-2d, H-2d, W-2d, Co) in x.dtype.
    """
    D, H, W, Ci = x.shape
    kz, ky, kx, wci, Co = w.shape
    assert (kz, ky, kx) == (3, 3, 3) and wci == Ci
    d = dilation
    D_out, H_out, OW = D - 2 * d, H - 2 * d, W - 2 * d
    if D_out <= 0 or H_out <= 0 or OW <= 0:
        raise ValueError("input smaller than receptive field")
    BZ, BY = block
    BZ, BY = min(BZ, D_out), min(BY, H_out)
    BZS, BYS = BZ + 2 * d, BY + 2 * d

    dtype = x.dtype
    kernel = functools.partial(
        _conv_kernel, BZ=BZ, BY=BY, W=W, Ci=Ci, Co=Co, d=d, im2col=im2col
    )
    grid = (-(-D_out // BZ), -(-H_out // BY))

    def in_idx(i, j):
        return (
            jnp.minimum(i * BZ, D_out - BZ),
            jnp.minimum(j * BY, H_out - BY),
            0,
            0,
        )

    def out_idx(i, j):
        return (
            jnp.minimum(i * BZ, D_out - BZ),
            jnp.minimum(j * BY, H_out - BY),
            0,
            0,
        )

    flops = 2 * D_out * H_out * OW * 27 * Ci * Co
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(BZS), pl.Element(BYS), pl.Element(W), pl.Element(Ci)),
                in_idx
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (pl.Element(BZ), pl.Element(BY), pl.Element(OW), pl.Element(Co)),
            out_idx
        ),
        out_shape=jax.ShapeDtypeStruct((D_out, H_out, OW, Co), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + D_out * H_out * OW * Co * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w.astype(dtype), b.astype(dtype))


def conv3d_reference(x, w, b, dilation=1):
    """lax reference: valid dilated conv + bias + relu (NDHWC)."""
    out = lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "VALID",
        rhs_dilation=(dilation,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )[0]
    return jnp.maximum(out + b, 0.0).astype(x.dtype)
