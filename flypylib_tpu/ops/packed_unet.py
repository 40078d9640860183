"""Space-to-depth packed inference engine for the valid-conv U-Net.

Same idea as :mod:`flypylib_tpu.ops.packed_conv` (channels x8 fill the
128-wide MXU lanes; the 24-96-channel U-Net otherwise runs at 8-28
TFLOP/s — BENCH_NOTES.md), extended to the pooling topology:

- every valid 3^3 conv becomes a valid 2^3 conv on the 2x2x2-packed
  lattice (``pack_weight_d1`` embeds the original taps exactly);
- **max-pool 2^3 stride 2 is an elementwise max over the 8 parity
  channel groups** of the packed tensor (the pooling window IS one
  packed cell) — no spatial op at all;
- **ConvTranspose kernel-2 stride-2 is a 1x1 conv producing the 8
  parity groups**: output voxel ``2r+p`` receives exactly one tap,
  ``x[r] @ K[1-p]`` (flax flips the kernel; probed numerically);
- crop-and-concat skips are handled in full-resolution semantics
  (unpack -> center-crop -> repack, pure relayout) and concatenated per
  parity group, matching the plain network's per-voxel channel order.

All rewrites re-associate the same multiply-adds, so outputs match
``UNetValid.apply`` to bf16 tolerance (tests/test_packed_unet.py).  The
packed model's size constraints are stricter (every pack step needs even
extents); :func:`packed_unet_spec` probes them numerically and exports a
drop-in ModelSpec, so TiledInference/DetectPipeline/sharded_infer work
unchanged.  Training delegates to the inner Flax module (one params tree
for checkpoints and Keras import).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from flypylib_tpu.models.zoo import ModelSpec, UNetValid, _probe_geometry
from flypylib_tpu.ops.packed_conv import (
    _PARITY,
    pack_volume,
    pack_weight_d1,
    unpack_volume,
)


def parity_group_max(x: jax.Array) -> jax.Array:
    """(B, D, H, W, 8C) packed -> (B, D, H, W, C): max over the parity
    groups == ``nn.max_pool(unpacked, (2,2,2), strides=(2,2,2))`` on the
    (even-extent) full-resolution tensor."""
    b, d, h, w, c8 = x.shape
    return x.reshape(b, d, h, w, 8, c8 // 8).max(axis=4)


def convT_packed_weight(k: jax.Array) -> jax.Array:
    """(2,2,2,Ci,Co) ConvTranspose kernel -> (Ci, 8Co) matrix whose
    output channels are parity-major packed.  Flax's ConvTranspose
    computes ``out[2r+p] = x[r] @ K[1-p]`` for kernel == stride == 2
    (numerically probed), so parity p reads the flipped tap."""
    cols = [k[1 - pz, 1 - py, 1 - px] for pz, py, px in _PARITY]
    return jnp.concatenate(cols, axis=-1)


def _concat_parity(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-parity-group channel concat of two packed tensors: matches
    ``concatenate([ua, ub], -1)`` on the unpacked voxels."""
    sa, sb = a.shape, b.shape
    ca, cb = sa[-1] // 8, sb[-1] // 8
    a = a.reshape(*sa[:-1], 8, ca)
    b = b.reshape(*sb[:-1], 8, cb)
    out = jnp.concatenate([a, b], axis=-1)
    return out.reshape(*sa[:-1], 8 * (ca + cb))


def _conv2(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


class PackedUNet:
    """Duck-typed inference module running a UNetValid in packed layout.

    Drop-in for ``ModelSpec.module``: ``init`` delegates to the inner
    Flax module (ONE params tree for both paths); ``apply`` runs the
    packed fast path for ``train=False`` and the inner module for
    training."""

    def __init__(self, inner: UNetValid):
        self.inner = inner
        self.dtype = inner.dtype

    def init(self, key, x, train: bool = False):
        return self.inner.init(key, x, train=train)

    def apply(self, variables, x, train: bool = False, rngs=None, **kw):
        if train or kw.get("mutable"):
            return self.inner.apply(
                variables, x, train=train, rngs=rngs, **kw
            )
        return self._forward(variables, x)

    def _forward(self, variables, x):
        inner = self.inner
        params = variables["params"]
        dt = self.dtype
        cps = inner.convs_per_stage
        levels = inner.levels
        conv_i = 0

        def packed_conv_relu(x, i):
            w = params[f"Conv_{i}"]["kernel"].astype(dt)
            b = params[f"Conv_{i}"]["bias"].astype(dt)
            y = _conv2(x, pack_weight_d1(w)) + jnp.tile(b, 8)
            return jax.nn.relu(y)

        x = pack_volume(x.astype(dt))
        skips = []
        for _ in range(levels):
            for _ in range(cps):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            skips.append(x)
            # pool == parity-group max; re-pack for the next level
            x = pack_volume(parity_group_max(x))

        # bottleneck (packed one lattice deeper than the last skip)
        for _ in range(cps):
            x = packed_conv_relu(x, conv_i)
            conv_i += 1
        x = unpack_volume(x)  # dense at the deepest pooled resolution

        for lev in reversed(range(levels)):
            kT = params[f"ConvTranspose_{levels - 1 - lev}"]
            w = convT_packed_weight(kT["kernel"].astype(dt))
            b = kT["bias"].astype(dt)
            # x: dense coarse -> packed fine (x2 upsample as a 1x1 conv)
            x = jnp.einsum("bdhwi,io->bdhwo", x, w) + jnp.tile(b, 8)
            skip = skips[lev]
            # center-crop the skip (full-resolution semantics) + repack
            sd = unpack_volume(skip)
            crops = [
                (sd.shape[i] - 2 * x.shape[i]) // 2 for i in (1, 2, 3)
            ]
            sc = sd[
                :,
                crops[0] : crops[0] + 2 * x.shape[1],
                crops[1] : crops[1] + 2 * x.shape[2],
                crops[2] : crops[2] + 2 * x.shape[3],
                :,
            ]
            x = _concat_parity(pack_volume(sc), x)
            for _ in range(cps):
                x = packed_conv_relu(x, conv_i)
                conv_i += 1
            if lev > 0:
                x = unpack_volume(x)  # dense input for the next convT

        # logits 1x1 conv (parity-independent): split-weight bf16 with
        # f32 accumulation (same trick as PackedConvStack — bf16->f32 is
        # value-exact on activations, only the weight needs two terms)
        wl = params[f"Conv_{conv_i}"]["kernel"].astype(jnp.float32)
        bl = params[f"Conv_{conv_i}"]["bias"].astype(jnp.float32)
        w0 = wl[0, 0, 0]  # (C, 1)
        w_hi = w0.astype(dt)
        w_lo = (w0 - w_hi.astype(jnp.float32)).astype(dt)
        wcat = jnp.concatenate([w_hi, w_lo], axis=-1)  # (C, 2)
        b_, d, h, w_sp, c8 = x.shape
        xg = x.reshape(b_, d, h, w_sp, 8, c8 // 8)
        y = jax.lax.dot_general(
            xg, wcat,
            (((5,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, D, H, W, 8, 2)
        y = y[..., 0] + y[..., 1] + bl  # (B, D, H, W, 8)
        return unpack_volume(y.reshape(b_, d, h, w_sp, 8 * 1))

    def __repr__(self):
        return f"PackedUNet({self.inner!r})"


@functools.lru_cache(maxsize=8)
def _packed_unet_geometry(module: UNetValid):
    pm = PackedUNet(module)
    return _probe_geometry(pm, lo=8, hi=200)


def packed_unet_spec(spec: ModelSpec) -> ModelSpec | None:
    """A ModelSpec running a UNetValid ``spec`` through the packed
    engine, or ``None`` when the module is not a UNetValid.  Shares the
    inner params tree; exports the packed (stricter) size constraints."""
    module = spec.module
    if not isinstance(module, UNetValid):
        return None
    try:
        pm = PackedUNet(module)
        ctx, mult, off, min_size = _packed_unet_geometry(module)
    except (ValueError, TypeError):
        return None
    return ModelSpec(
        name=spec.name + "+packed",
        module=pm,
        context=ctx,
        size_multiple=mult,
        size_offset=off,
        min_size=min_size,
        metadata={**spec.metadata, "packed": True},
    )
