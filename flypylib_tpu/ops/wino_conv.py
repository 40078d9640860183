"""Fused Winograd F(2x2x2, 3x3x3) conv3d + bias + ReLU Pallas kernel.

Stage B of the packed inference engine (ops/packed_conv.py) runs its
dilated layers as dilation-1 3^3 convs on parity lattices with 32-64
channels — too narrow to fill the MXU's 128 lanes, so XLA's direct conv
measures 22-55 TFLOP/s (experiments/stageb_opt.jsonl).  The Winograd
F(2,3)^3 transform computes the same convolution with 3.375x fewer
multiply-adds: per 2^3 output block, 4^3 = 64 transform-domain products
replace 8 x 27 = 216 direct taps.  The transform-domain contraction is a
batched (M, Ci) @ (Ci, Co) matmul whose measured rate (25-36 TFLOP/s raw)
puts the *dense-equivalent* throughput at 86-123 TFLOP/s — 2-4x over
direct — **if** the transforms stay off HBM.  XLA-level winograd loses
that win to transform-tensor traffic (the (64, M, Ci) V-tensor alone is
~1.3 GB at stage-B sizes), hence this fused kernel:

- grid over (batch, z-blocks, y-blocks), full W span per block;
- the input tile transform B^T x B (per axis: rows of BT have exactly two
  +-1 entries, so each of the 64 taps is a signed sum of <= 8 input
  voxels, built stage-by-stage with contiguous block/parity slices — no
  strided VMEM access) runs on the VPU entirely in VMEM;
- per tap t: one MXU matmul V_t @ U_t accumulated straight into the 2^3
  output phases with the A-transform's +-1 coefficients (static unrolled
  — the transform-domain product tensor is never materialized);
- bias + ReLU fuse into the epilogue; BatchNorm folds into (U, bias)
  outside the kernel (inference affine).

The kernel writes the output **phase-major** — (N, 8, D', H', W', Co)
with phase g = (gz*2+gy)*2+gx and D' = (D-2)/2 — because interleaving
phases in-kernel is a high-rank Mosaic transpose; the wrapper interleaves
with one XLA transpose over the (small) output tensor instead.

Weights are pre-transformed once per model: U = (G (x) G (x) G) w with
G the 4x3 Winograd filter transform — exact in binary f.p. (0, 1, 1/2).

Correctness is pinned against ``lax.conv_general_dilated`` in
tests/test_wino_conv.py (interpret mode on CPU, compiled on TPU).

This kernel is a STANDALONE experimental study: nothing on the
production path routes to it.  It was measured against the packed-conv
engine's XLA stage-B convs and REJECTED for the production path
(slower at the operating tile shapes — BENCH_NOTES.md round 2); it is
kept, with its tests, as a documented negative result and a starting
point if future Mosaic versions change the trade-off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2, 3) transform matrices (exact in binary floating point)
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
    np.float32,
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

# BT row A -> ((block_offset, parity, sign) x2): position p of the two
# nonzeros of BT[A] decomposed as p = 2*block + parity
_BT_TERMS = []
for _A in range(4):
    _terms = [
        (p // 2, p % 2, int(BT[_A, p])) for p in range(4) if BT[_A, p]
    ]
    assert len(_terms) == 2
    _BT_TERMS.append(tuple(_terms))

# AT column A -> ((output_phase g, sign), ...)
_AT_TERMS = [
    tuple((g, int(AT[g, A])) for g in range(2) if AT[g, A])
    for A in range(4)
]


def wino_transform_weights(w: jax.Array) -> jax.Array:
    """(3,3,3,Ci,Co) valid-conv kernel -> (64, Ci, Co) transform-domain
    weights (f32; cast to the compute dtype at call time)."""
    g = jnp.asarray(G)
    u = jnp.einsum(
        "az,by,cx,zyxio->abcio", g, g, g, w.astype(jnp.float32)
    )
    return u.reshape(64, w.shape[3], w.shape[4])


def _bt_combine(a, b, terms):
    """s0*a + s1*b for one BT row's two (+-1) coefficients."""
    (_, _, s0), (_, _, s1) = terms
    if s0 > 0 and s1 > 0:
        return a + b
    if s0 > 0:
        return a - b
    if s1 > 0:
        return b - a
    return -(a + b)


def _wino_kernel(x_ref, u_ref, b_ref, out_ref, *, BZ, BY, W, Ci, Co, relu):
    """One (BZ, BY, W-2) output block: transform -> 64 matmuls -> inverse.

    x_ref: (BZS, BYS, W, Ci) with BZS = BZ + 2, BYS = BY + 2 (halo 1).
    out_ref: (8, BZ//2, BY//2, (W-2)//2, Co) phase-major.
    """
    BZS, BYS = BZ + 2, BY + 2
    hz, hy, wb = BZ // 2, BY // 2, (W - 2) // 2
    M = hz * hy * wb

    x = x_ref[...]
    # leading-dim reshapes are free (minor dims untouched): decompose each
    # spatial index as 2*block + parity so every transform stage uses
    # contiguous block slices + parity indexing, never strided access
    xz = x.reshape(BZS // 2, 2, BYS, W, Ci)

    # stage z: T1[A] (hz, BYS, W, Ci)
    t1 = []
    for A in range(4):
        (b0, p0, _), (b1, p1, _) = _BT_TERMS[A]
        t1.append(
            _bt_combine(
                xz[b0 : b0 + hz, p0], xz[b1 : b1 + hz, p1], _BT_TERMS[A]
            )
        )

    # stage y: T2[A][B] (hz, hy, W, Ci)
    t2 = [[None] * 4 for _ in range(4)]
    for A in range(4):
        ty = t1[A].reshape(hz, BYS // 2, 2, W, Ci)
        for B in range(4):
            (b0, p0, _), (b1, p1, _) = _BT_TERMS[B]
            t2[A][B] = _bt_combine(
                ty[:, b0 : b0 + hy, p0],
                ty[:, b1 : b1 + hy, p1],
                _BT_TERMS[B],
            )

    bias = b_ref[...].reshape(1, Co).astype(jnp.float32)

    # stage x + matmul + A-transform accumulation, tap by tap; the 8
    # phase accumulators live as values (Mosaic register/VMEM allocation)
    acc = [jnp.zeros((M, Co), jnp.float32) for _ in range(8)]
    for A in range(4):
        for B in range(4):
            tx = t2[A][B].reshape(hz, hy, W // 2, 2, Ci)
            for C in range(4):
                (b0, p0, _), (b1, p1, _) = _BT_TERMS[C]
                v = _bt_combine(
                    tx[:, :, b0 : b0 + wb, p0],
                    tx[:, :, b1 : b1 + wb, p1],
                    _BT_TERMS[C],
                )
                t = (A * 4 + B) * 4 + C
                m = jnp.dot(
                    v.reshape(M, Ci),
                    u_ref[t],
                    preferred_element_type=jnp.float32,
                )
                # accumulate into the <=8 output phases this tap feeds
                # (inverse transform, +-1 coefficients)
                for gz, sz in _AT_TERMS[A]:
                    for gy, sy in _AT_TERMS[B]:
                        for gx, sx in _AT_TERMS[C]:
                            g = (gz * 2 + gy) * 2 + gx
                            acc[g] = acc[g] + (
                                m if sz * sy * sx > 0 else -m
                            )

    for g in range(8):
        y = acc[g] + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[g] = y.astype(out_ref.dtype).reshape(hz, hy, wb, Co)


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "relu")
)
def wino_conv3d_bias_relu(
    x: jax.Array,
    u: jax.Array,
    b: jax.Array,
    block: tuple[int, int] = (8, 16),
    interpret: bool = False,
    relu: bool = True,
) -> jax.Array:
    """Fused valid 3^3 conv via Winograd F(2,3)^3 (+ bias + optional ReLU).

    x: (N, D, H, W, Ci) with D, H, W even (output dims D-2 etc. are then
    even — Winograd's 2-voxel output phase requires it; callers fall back
    to the direct conv otherwise).  u: (64, Ci, Co) from
    :func:`wino_transform_weights`.  b: (Co,).
    Returns (N, D-2, H-2, W-2, Co) in x.dtype.
    """
    N, D, H, W, Ci = x.shape
    Co = u.shape[-1]
    if D % 2 or H % 2 or W % 2:
        raise ValueError(f"winograd needs even spatial dims, got {x.shape}")
    D_out, H_out, OW = D - 2, H - 2, W - 2
    BZ, BY = block
    BZ, BY = min(BZ, D_out), min(BY, H_out)
    if BZ % 2 or BY % 2:
        raise ValueError(f"block {block} must be even")
    MD, MH, MW = D_out // 2, H_out // 2, OW // 2
    hz, hy = BZ // 2, BY // 2

    kernel = functools.partial(
        _wino_kernel, BZ=BZ, BY=BY, W=W, Ci=Ci, Co=Co, relu=relu
    )
    grid = (N, -(-MD // hz), -(-MH // hy))

    def in_idx(n, i, j):
        # clamped inward shift in whole 2^3 blocks, so edge blocks
        # re-compute identical values — same trick as ops/pallas_conv.py
        return (
            n,
            2 * jnp.minimum(i * hz, MD - hz),
            2 * jnp.minimum(j * hy, MH - hy),
            0,
            0,
        )

    def out_idx(n, i, j):
        return (
            n,
            0,
            jnp.minimum(i * hz, MD - hz),
            jnp.minimum(j * hy, MH - hy),
            0,
            0,
        )

    dtype = x.dtype
    flops = 2 * N * D_out * H_out * OW * Ci * Co * 8  # 64 prods / 8 vox
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Squeezed(),
                    pl.Element(BZ + 2),
                    pl.Element(BY + 2),
                    pl.Element(W),
                    pl.Element(Ci),
                ),
                in_idx,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (
                pl.Squeezed(),
                pl.Element(8),
                pl.Element(hz),
                pl.Element(hy),
                pl.Element(MW),
                pl.Element(Co),
            ),
            out_idx,
        ),
        out_shape=jax.ShapeDtypeStruct((N, 8, MD, MH, MW, Co), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + N * 8 * MD * MH * MW * Co * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, u.astype(dtype), b.astype(dtype))

    # phase-major -> interleaved (one XLA transpose over the output, the
    # small tensor; in-kernel interleave would be a high-rank Mosaic
    # transpose)
    y = out.reshape(N, 2, 2, 2, MD, MH, MW, Co)
    y = y.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return y.reshape(N, D_out, H_out, OW, Co)
