"""Fused Pallas kernel for the packed U-Net decoder tail (level 0).

Why this exists: the packed U-Net's level-0 stages run on the biggest
spatial extents of the whole network (~176^3 cells at the 1k^3 bench
operating point) and XLA's monolithic big-spatial convs collapse to
~53-84 TF/s there, while the very same math re-tiled into ~31^3 blocks
runs at 140+ TF/s (experiments/dec0_retile.jsonl).  Every XLA-level
re-tile materializes the blocked copies in HBM, and those relayouts eat
the win (experiments/unet_split_dec0.jsonl — measured and rejected).
A Pallas kernel does the re-tile *implicitly*: overlapping halo windows
stream HBM->VMEM via ``pl.Element`` block specs (Pallas double-buffers
them automatically), all stages compute in VMEM at block scale, and
only the final logits block is written back.  The intermediate
full-resolution tensors (175^3 x 192 and 174^3 x 192 at the operating
point — ~4 GB of HBM round-trips) never exist.

Formulation (the MXU-friendly way): a valid 2^3 conv on a flattened
(S, C) block is eight flat-shifted matmuls — tap ``(dz, dy, dx)``
contributes ``x_flat[off : off + S] @ W[tap]`` with
``off = dz*SY*SX + dy*SX + dx``.  Rows whose y/x coordinate would wrap
across a block row produce garbage, but those are exactly the halo
rows the valid slice discards at the end — the same trick
:mod:`flypylib_tpu.ops.pallas_conv` uses per plane, extended to 3-D
blocks so each input window is read once per ~(B/(B+n))^3 useful
voxels instead of once per plane.

Numerics: each stage accumulates its eight taps in f32, rounds to the
model dtype, then adds the (model-dtype) bias and applies ReLU — the
same rounding points as the XLA path (``_conv2(x, w) + tile(b, 8)``),
so the only difference is f32 accumulation order (tap-major here vs
lax's internal order, plus MXU partial-sum chunking) — ~1 ulp bf16 on
a small fraction of values (measured 0.05% at unit scale), same class
as the packed-vs-plain re-association.  Every output row's reduction
order is position-independent, so tiled == monolithic stays bitwise
(invariant 2) WHEN the engine routes all tiles through this kernel.

Reference parity: this fuses the same ops as
``PackedUNet._forward``'s level-0 epilogue (fold conv + ReLU + conv +
ReLU + split-weight logits dot; flypylib's fplmodels U-Net variant,
SURVEY.md eval config 4) — it is a scheduling rewrite, not a semantics
change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tap order must match lax.conv's (z, y, x) kernel walk so that the
# f32 tap-accumulation order is at least fixed (values are exact per
# tap; order only matters at the f32 rounding level)
_TAPS = [(dz, dy, dx) for dz in range(2) for dy in range(2) for dx in range(2)]


def _tail_kernel(x_ref, *refs, n_stages, SZ, SY, SX, BZ, BY, BX, chans,
                 logits, out_dtype):
    """One (BZ, BY, BX) output block of the fused stage chain.

    x_ref: (SZ, SY, SX, C0) halo window, S* = B* + n_stages.
    refs: per stage (w_ref (8, Ci, Co), b_ref (1, Co)), then with
    ``logits`` (wl_ref (Cn, 2*L), bl_ref (1, L)), then out_ref.
    """
    out_ref = refs[-1]
    S = SZ * SY * SX
    plane, row = SY * SX, SX

    cur = x_ref[...].reshape(S, chans[0])
    for s in range(n_stages):
        w_ref, b_ref = refs[2 * s], refs[2 * s + 1]
        ci, co = chans[s], chans[s + 1]
        pad = plane + row + 1
        # zero tail so every tap's shifted window is in bounds; the
        # affected rows are flat-invalid and sliced away at the end
        buf = jnp.concatenate([cur, jnp.zeros((pad, ci), cur.dtype)])
        acc = jnp.zeros((S, co), jnp.float32)
        for t, (dz, dy, dx) in enumerate(_TAPS):
            off = dz * plane + dy * row + dx
            acc = acc + jnp.dot(
                buf[off : off + S],
                w_ref[t],
                preferred_element_type=jnp.float32,
            )
        # round to model dtype BEFORE the bias add — the XLA path's
        # rounding points (conv -> bf16, + bf16 bias, relu)
        cur = jnp.maximum(acc.astype(cur.dtype) + b_ref[...], 0.0)

    if logits:
        wl_ref, bl_ref = refs[2 * n_stages], refs[2 * n_stages + 1]
        L = bl_ref.shape[-1]
        y2 = jnp.dot(cur, wl_ref[...], preferred_element_type=jnp.float32)
        y = y2[:, :L] + y2[:, L:] + bl_ref[...]
        cn = L
    else:
        y = cur
        cn = chans[-1]

    y = y.reshape(SZ, SY, SX, cn)[:BZ, :BY, :BX]
    out_ref[...] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "interpret", "out_dtype_name"),
)
def _packed_tail_call(x, ws, bs, wl, bl, block, interpret, out_dtype_name):
    D, H, W, C0 = x.shape
    n = len(ws)
    chans = (C0,) + tuple(w.shape[-1] for w in ws)
    logits = wl is not None
    out_dtype = jnp.dtype(out_dtype_name)

    DO, HO, WO = D - n, H - n, W - n
    BZ, BY, BX = (min(b, o) for b, o in zip(block, (DO, HO, WO)))
    SZ, SY, SX = BZ + n, BY + n, BX + n

    grid = (-(-DO // BZ), -(-HO // BY), -(-WO // BX))

    def in_idx(i, j, k):
        return (
            jnp.minimum(i * BZ, DO - BZ),
            jnp.minimum(j * BY, HO - BY),
            jnp.minimum(k * BX, WO - BX),
            0,
        )

    cn = bl.shape[-1] if logits else chans[-1]
    in_specs = [
        pl.BlockSpec(
            (pl.Element(SZ), pl.Element(SY), pl.Element(SX), pl.Element(C0)),
            in_idx,
        )
    ]
    args = [x]
    for w, b in zip(ws, bs):
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args += [w, b.reshape(1, -1)]
    if logits:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args += [wl, bl.reshape(1, -1)]

    kernel = functools.partial(
        _tail_kernel,
        n_stages=n,
        SZ=SZ, SY=SY, SX=SX, BZ=BZ, BY=BY, BX=BX,
        chans=chans,
        logits=logits,
        out_dtype=out_dtype,
    )

    flops = 0
    for s in range(n):
        flops += 2 * (D - s - 1) * (H - s - 1) * (W - s - 1) * 8 \
            * chans[s] * chans[s + 1]
    if logits:
        flops += 2 * DO * HO * WO * chans[-1] * 2 * cn

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (pl.Element(BZ), pl.Element(BY), pl.Element(BX), pl.Element(cn)),
            in_idx,
        ),
        out_shape=jax.ShapeDtypeStruct((DO, HO, WO, cn), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + DO * HO * WO * cn * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def packed_tail(x, stages, logits=None, block=(8, 16, 16),
                interpret: bool = False):
    """Fused chain of valid 2^3 convs (+ReLU) with an optional final
    split-weight logits dot, blocked for the MXU.

    x: (D, H, W, C0) model-dtype tensor (a packed-lattice activation).
    stages: sequence of ``(w, b)`` with ``w`` (2, 2, 2, Ci, Co) and
        ``b`` (Co,), both model dtype — exactly the operands the XLA
        path feeds ``_conv2(x, w) + b``.
    logits: optional ``(wl, bl)``: ``wl`` (Cn, 2L) model dtype — the
        hi/lo split-weight columns — and ``bl`` (L,) f32; output is
        ``y[:, :L] + y[:, L:] + bl`` in f32 (bitwise the production
        block-diagonal logits epilogue for the same dot shape).
    Returns (D-n, H-n, W-n, L) f32 with logits, else (..., Cn) in
    x.dtype.
    """
    ws, bs, wl, bl = [], [], None, None
    for w, b in stages:
        kz, ky, kx, ci, co = w.shape
        if (kz, ky, kx) != (2, 2, 2):
            raise ValueError(f"packed_tail stages must be 2^3 convs, got {w.shape}")
        ws.append(w.reshape(8, ci, co))
        bs.append(b)
    n = len(ws)
    D, H, W, _ = x.shape
    if min(D - n, H - n, W - n) < 1:
        raise ValueError(f"input {x.shape} smaller than chain depth {n}")
    if logits is not None:
        wl, bl = logits
        if wl.shape[-1] != 2 * bl.shape[-1]:
            raise ValueError(
                f"logits weight {wl.shape} must stack hi/lo columns for bias "
                f"{bl.shape}"
            )
        out_dtype_name = "float32"
    else:
        out_dtype_name = jnp.dtype(x.dtype).name
    return _packed_tail_call(
        x, tuple(ws), tuple(bs), wl, bl, tuple(block), interpret,
        out_dtype_name,
    )


def tail_reference(x, stages, logits=None):
    """lax reference with the SAME rounding points (for tests)."""
    from jax import lax

    cur = x
    for w, b in stages:
        y = lax.conv_general_dilated(
            cur[None], w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]
        cur = jnp.maximum(y + b, 0.0)
    if logits is None:
        return cur
    wl, bl = logits
    L = bl.shape[-1]
    y2 = jax.lax.dot_general(
        cur, wl, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y2[..., :L] + y2[..., L:] + bl
