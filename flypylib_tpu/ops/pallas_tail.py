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

def _tail_kernel(x_ref, *refs, n_stages, SZ, SY, SX, BZ, BY, BX, chans,
                 logits, out_dtype):
    """One (BZ, BY, BX) output block of the fused stage chain.

    x_ref: (SZ, SY, SX, C0) halo window, S* = B* + n_stages.
    refs: per stage (w_ref (2,2,2, Ci, Co), b_ref (1, Co)), then with
    ``logits`` (wl_ref (Cn, 2*L), bl_ref (1, L)), then out_ref.

    Structure follows the TPU-proven idiom of ops/pallas_conv.py: work
    per z-plane on flattened (y*x, C) rows, copy each (dz, dy, dx)
    column block straight into an im2col scratch (normalizing every dot
    operand to sublane offset 0 — Mosaic crashes on dots over offset
    row slices), and run ONE (rows, 8*Ci) @ (8*Ci, Co) matmul per
    output plane.  Stage s consumes planes with (SY - s) valid y-rows;
    x-wrap garbage columns are cropped by the final ``[:, :BX]`` slice.

    VMEM discipline (the first draft OOM'd the Mosaic stack allocator):
    ONE scratch per stage scoped around the whole z loop — per-(z)
    ``run_scoped`` calls each got their own stack slot — and NO lane-dim
    concat of the two z-planes (240+240 unaligned channels made Mosaic
    materialize a big ``%_pack`` temp per z); both dz column blocks are
    written into the scratch directly.  Each plane instead carries one
    zero pad ROW (sublane concat — cheap) so the (dy=1, dx=1) tap's row
    window stays in bounds.
    """
    out_ref = refs[-1]

    # stage s input planes: list over z of (rows_s * SX + 1, C) values
    # (one zero pad row; the padded output lands in cropped x columns)
    rows = [(SY - s) * SX for s in range(n_stages + 1)]
    zrow0 = jnp.zeros((1, chans[0]), x_ref.dtype)
    planes = [
        jnp.concatenate([x_ref[z].reshape(rows[0], chans[0]), zrow0])
        for z in range(SZ)
    ]

    for s in range(n_stages):
        w_ref, b_ref = refs[2 * s], refs[2 * s + 1]
        ci, co = chans[s], chans[s + 1]
        # rhs column order = [(dy, dx) K-blocks] x [dz] x [ci]
        rhs = jnp.transpose(w_ref[...], (1, 2, 0, 3, 4)).reshape(
            8 * ci, co
        )
        bias = b_ref[...]
        m_out = rows[s + 1]
        zrow = jnp.zeros((1, co), x_ref.dtype)
        last = s == n_stages - 1

        def stage(scr, planes=planes, rhs=rhs, bias=bias, ci=ci,
                  m_out=m_out, zrow=zrow, last=last):
            nxt = []
            for z in range(len(planes) - 1):
                for k, (dy, dx) in enumerate(
                    (dy, dx) for dy in range(2) for dx in range(2)
                ):
                    off = dy * SX + dx
                    scr[:, 2 * k * ci : (2 * k + 1) * ci] = planes[z][
                        off : off + m_out
                    ]
                    scr[:, (2 * k + 1) * ci : (2 * k + 2) * ci] = planes[
                        z + 1
                    ][off : off + m_out]
                acc = jnp.dot(
                    scr[:], rhs, preferred_element_type=jnp.float32
                )
                # round to model dtype BEFORE the bias add — the XLA
                # path's rounding points (conv -> bf16, + bf16 bias,
                # relu)
                y = jnp.maximum(acc.astype(x_ref.dtype) + bias, 0.0)
                nxt.append(y if last else jnp.concatenate([y, zrow]))
            return nxt

        planes = pl.run_scoped(
            stage, pltpu.VMEM((m_out, 8 * ci), x_ref.dtype)
        )

    if logits:
        wl_ref, bl_ref = refs[2 * n_stages], refs[2 * n_stages + 1]
        L = bl_ref.shape[-1]
        cn = L
    else:
        cn = chans[-1]
    for z in range(BZ):
        if logits:
            y2 = jnp.dot(
                planes[z], wl_ref[...], preferred_element_type=jnp.float32
            )
            y = y2[:, :L] + y2[:, L:] + bl_ref[...]
        else:
            y = planes[z]
        out_ref[z] = y.reshape(BY, SX, cn)[:, :BX].astype(out_dtype)


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
    if not interpret:
        # Mosaic requires the last two block dims to be (8,128)-divisible
        # or equal to the full array dims.  SX = BX + n can never satisfy
        # the sublane rule at the same time as the out spec's BX, so on
        # real TPU the x axis is always unblocked (full-width windows) —
        # the same geometry ops/pallas_conv.py compiles with.
        BX = WO
    SZ, SY, SX = BZ + n, BY + n, BX + n

    grid = (-(-DO // BZ), -(-HO // BY), -(-WO // BX))

    def in_idx(i, j, k):
        # the x (sublane-tiled) offset must be a PROVABLY 8-divisible
        # expression or Mosaic refuses the window ("Couldn't prove that
        # tiling (8) divides index...'); when the x axis is unblocked
        # (always, on real TPU) emit the literal 0 instead of
        # min(k*BX, 0), which Mosaic cannot simplify.
        kx = 0 if BX == WO else jnp.minimum(k * BX, WO - BX)
        return (
            jnp.minimum(i * BZ, DO - BZ),
            jnp.minimum(j * BY, HO - BY),
            kx,
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
        ws.append(w)
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


def _tail2_kernel(xa_ref, xb_ref, *refs, n_stages, SZ, SY, SX, BZ, BY,
                  BX, ca, cb, chans, logits, out_dtype):
    """Two-ref variant of :func:`_tail_kernel`: stage 0 consumes the
    PRE-concat decoder operands (skip ``xa`` and upsampled ``xb``) as
    separate refs and sums two im2col dots in VMEM — the concat
    boundary tensor (8Cs+Cc wide, the round-7b relayout tax) never
    exists anywhere, HBM or VMEM.  Stages 1+ and the logits epilogue
    are identical to the one-ref kernel."""
    out_ref = refs[-1]
    rows = [(SY - s) * SX for s in range(n_stages + 1)]
    za = jnp.zeros((1, ca), xa_ref.dtype)
    zb = jnp.zeros((1, cb), xb_ref.dtype)
    planes_a = [
        jnp.concatenate([xa_ref[z].reshape(rows[0], ca), za])
        for z in range(SZ)
    ]
    planes_b = [
        jnp.concatenate([xb_ref[z].reshape(rows[0], cb), zb])
        for z in range(SZ)
    ]

    # stage 0: acc = im2col(a) @ Wa + im2col(b) @ Wb
    wa_ref, wb_ref, b0_ref = refs[0], refs[1], refs[2]
    co0 = chans[1]
    rhs_a = jnp.transpose(wa_ref[...], (1, 2, 0, 3, 4)).reshape(
        8 * ca, co0
    )
    rhs_b = jnp.transpose(wb_ref[...], (1, 2, 0, 3, 4)).reshape(
        8 * cb, co0
    )
    bias0 = b0_ref[...]
    m0 = rows[1]
    zrow0 = jnp.zeros((1, co0), xa_ref.dtype)
    only = n_stages == 1

    def stage0(scr_a, scr_b):
        nxt = []
        for z in range(len(planes_a) - 1):
            for k, (dy, dx) in enumerate(
                (dy, dx) for dy in range(2) for dx in range(2)
            ):
                off = dy * SX + dx
                scr_a[:, 2 * k * ca : (2 * k + 1) * ca] = planes_a[z][
                    off : off + m0
                ]
                scr_a[:, (2 * k + 1) * ca : (2 * k + 2) * ca] = planes_a[
                    z + 1
                ][off : off + m0]
                scr_b[:, 2 * k * cb : (2 * k + 1) * cb] = planes_b[z][
                    off : off + m0
                ]
                scr_b[:, (2 * k + 1) * cb : (2 * k + 2) * cb] = planes_b[
                    z + 1
                ][off : off + m0]
            acc = jnp.dot(
                scr_a[:], rhs_a, preferred_element_type=jnp.float32
            ) + jnp.dot(
                scr_b[:], rhs_b, preferred_element_type=jnp.float32
            )
            y = jnp.maximum(acc.astype(xa_ref.dtype) + bias0, 0.0)
            nxt.append(y if only else jnp.concatenate([y, zrow0]))
        return nxt

    planes = pl.run_scoped(
        stage0,
        pltpu.VMEM((m0, 8 * ca), xa_ref.dtype),
        pltpu.VMEM((m0, 8 * cb), xb_ref.dtype),
    )

    for s in range(1, n_stages):
        w_ref, b_ref = refs[2 * s + 1], refs[2 * s + 2]
        ci, co = chans[s], chans[s + 1]
        rhs = jnp.transpose(w_ref[...], (1, 2, 0, 3, 4)).reshape(
            8 * ci, co
        )
        bias = b_ref[...]
        m_out = rows[s + 1]
        zrow = jnp.zeros((1, co), xa_ref.dtype)
        last = s == n_stages - 1

        def stage(scr, planes=planes, rhs=rhs, bias=bias, ci=ci,
                  m_out=m_out, zrow=zrow, last=last):
            nxt = []
            for z in range(len(planes) - 1):
                for k, (dy, dx) in enumerate(
                    (dy, dx) for dy in range(2) for dx in range(2)
                ):
                    off = dy * SX + dx
                    scr[:, 2 * k * ci : (2 * k + 1) * ci] = planes[z][
                        off : off + m_out
                    ]
                    scr[:, (2 * k + 1) * ci : (2 * k + 2) * ci] = planes[
                        z + 1
                    ][off : off + m_out]
                acc = jnp.dot(
                    scr[:], rhs, preferred_element_type=jnp.float32
                )
                y = jnp.maximum(acc.astype(xa_ref.dtype) + bias, 0.0)
                nxt.append(y if last else jnp.concatenate([y, zrow]))
            return nxt

        planes = pl.run_scoped(
            stage, pltpu.VMEM((m_out, 8 * ci), xa_ref.dtype)
        )

    if logits:
        wl_ref, bl_ref = refs[2 * n_stages + 1], refs[2 * n_stages + 2]
        L = bl_ref.shape[-1]
        cn = L
    else:
        cn = chans[-1]
    for z in range(BZ):
        if logits:
            y2 = jnp.dot(
                planes[z], wl_ref[...], preferred_element_type=jnp.float32
            )
            y = y2[:, :L] + y2[:, L:] + bl_ref[...]
        else:
            y = planes[z]
        out_ref[z] = y.reshape(BY, SX, cn)[:, :BX].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "interpret", "out_dtype_name"),
)
def _packed_tail2_call(xa, xb, wa, wb, b0, ws, bs, wl, bl, block,
                       interpret, out_dtype_name):
    D, H, W, ca = xa.shape
    cb = xb.shape[-1]
    n = 1 + len(ws)
    chans = (None, wa.shape[-1]) + tuple(w.shape[-1] for w in ws)
    logits = wl is not None
    out_dtype = jnp.dtype(out_dtype_name)

    DO, HO, WO = D - n, H - n, W - n
    BZ, BY, BX = (min(b, o) for b, o in zip(block, (DO, HO, WO)))
    if not interpret:
        BX = WO  # Mosaic lane rule — see _packed_tail_call
    SZ, SY, SX = BZ + n, BY + n, BX + n

    grid = (-(-DO // BZ), -(-HO // BY), -(-WO // BX))

    def in_idx(i, j, k):
        kx = 0 if BX == WO else jnp.minimum(k * BX, WO - BX)
        return (
            jnp.minimum(i * BZ, DO - BZ),
            jnp.minimum(j * BY, HO - BY),
            kx,
            0,
        )

    cn = bl.shape[-1] if logits else chans[-1]
    in_specs = [
        pl.BlockSpec(
            (pl.Element(SZ), pl.Element(SY), pl.Element(SX),
             pl.Element(c)),
            in_idx,
        )
        for c in (ca, cb)
    ]
    args = [xa, xb, wa, wb, b0.reshape(1, -1)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    for w, b in zip(ws, bs):
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        args += [w, b.reshape(1, -1)]
    if logits:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        args += [wl, bl.reshape(1, -1)]

    kernel = functools.partial(
        _tail2_kernel,
        n_stages=n,
        SZ=SZ, SY=SY, SX=SX, BZ=BZ, BY=BY, BX=BX,
        ca=ca, cb=cb,
        chans=chans,
        logits=logits,
        out_dtype=out_dtype,
    )

    flops = 2 * (D - 1) * (H - 1) * (W - 1) * 8 * (ca + cb) * chans[1]
    for s in range(1, n):
        flops += 2 * (D - s - 1) * (H - s - 1) * (W - s - 1) * 8 \
            * chans[s] * chans[s + 1]
    if logits:
        flops += 2 * DO * HO * WO * chans[-1] * 2 * cn

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (pl.Element(BZ), pl.Element(BY), pl.Element(BX),
             pl.Element(cn)),
            in_idx,
        ),
        out_shape=jax.ShapeDtypeStruct((DO, HO, WO, cn), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xa.size + xb.size) * xa.dtype.itemsize
            + DO * HO * WO * cn * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def packed_tail2(xa, xb, stage0, stages=(), logits=None,
                 block=(3, 3, 1 << 30), interpret: bool = False):
    """:func:`packed_tail` whose FIRST stage consumes the pre-concat
    decoder operands: ``relu(conv2(xa, wa) + conv2(xb, wb) + b)`` with
    ``stage0 = (wa, wb, b)`` — the level-0 fold without ever building
    ``concat([xa, xb])`` (the round-7b boundary).  ``stages``/``logits``
    as in :func:`packed_tail`."""
    wa, wb, b0 = stage0
    if wa.shape[:3] != (2, 2, 2) or wb.shape[:3] != (2, 2, 2):
        raise ValueError(
            f"stage0 must be 2^3 convs, got {wa.shape} / {wb.shape}"
        )
    if wa.shape[-1] != wb.shape[-1]:
        raise ValueError("stage0 halves must share the output width")
    ws, bs = [], []
    for w, b in stages:
        if w.shape[:3] != (2, 2, 2):
            raise ValueError(
                f"packed_tail stages must be 2^3 convs, got {w.shape}"
            )
        ws.append(w)
        bs.append(b)
    n = 1 + len(ws)
    D, H, W, _ = xa.shape
    if xb.shape[:3] != (D, H, W):
        raise ValueError(f"operand shapes differ: {xa.shape} {xb.shape}")
    if min(D - n, H - n, W - n) < 1:
        raise ValueError(f"input {xa.shape} smaller than chain depth {n}")
    wl = bl = None
    if logits is not None:
        wl, bl = logits
        if wl.shape[-1] != 2 * bl.shape[-1]:
            raise ValueError(
                f"logits weight {wl.shape} must stack hi/lo columns for "
                f"bias {bl.shape}"
            )
        out_dtype_name = "float32"
    else:
        out_dtype_name = jnp.dtype(xa.dtype).name
    return _packed_tail2_call(
        xa, xb, wa, wb, b0, tuple(ws), tuple(bs), wl, bl, tuple(block),
        interpret, out_dtype_name,
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
