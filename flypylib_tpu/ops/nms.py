"""Non-max suppression — on-device (XLA) with a host finalization step.

Parity: flypylib fplobjdetect NMS — a voxel is a candidate iff it equals the
max of its neighborhood and exceeds a threshold (SURVEY.md section 3.3).
The device path computes the max-filter compare with ``lax.reduce_window``
(-inf identity padding == scipy ``mode='constant', cval=-inf``) and extracts
the top-k candidates fully on device, so the probability map never leaves
HBM; only the (k, 4) detection list is transferred to host.

Tie-breaking matches flypylib_tpu.ops.host_reference: ``lax.top_k`` returns
equal values in ascending flat-index order, which is exactly (z, y, x)
ascending — the canonical order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.utils import to3d


def mask_valid_region(prob: jax.Array, valid_lo, valid_hi):
    """(masked prob, in-bounds mask): voxels outside ``[valid_lo,
    valid_hi)`` become -inf so they can neither be candidates nor
    suppress/join in-bounds ones — the monolithic boundary rule for ROI
    prob regions that extend past the true volume.  ``valid_lo``/
    ``valid_hi`` are traced (3,) int32 arrays.  Shared by the fused
    pipeline postprocess and both streaming CC extractors, so the
    exactness semantics live in exactly one place."""
    zz = lax.broadcasted_iota(jnp.int32, prob.shape, 0)
    yy = lax.broadcasted_iota(jnp.int32, prob.shape, 1)
    xx = lax.broadcasted_iota(jnp.int32, prob.shape, 2)
    inb = (
        (zz >= valid_lo[0]) & (zz < valid_hi[0])
        & (yy >= valid_lo[1]) & (yy < valid_hi[1])
        & (xx >= valid_lo[2]) & (xx < valid_hi[2])
    )
    return jnp.where(inb, prob, -jnp.inf), inb


def max_filter(prob: jax.Array, window=3) -> jax.Array:
    """Separable 3D max filter with -inf (out-of-bounds) padding.

    max over a box window factorizes into three 1-D passes — O(wz+wy+wx)
    reads per voxel instead of O(wz*wy*wx); identical result to a single
    3-D ``reduce_window`` (scipy ``maximum_filter`` with constant -inf).
    """
    win = to3d(window)
    out = prob
    for axis, w in enumerate(win):
        if w == 1:
            continue
        dims = [1, 1, 1]
        dims[axis] = w
        pads = [(0, 0)] * 3
        pads[axis] = (w // 2, w - 1 - w // 2)
        out = lax.reduce_window(
            out, -jnp.inf, lax.max,
            window_dimensions=tuple(dims), window_strides=(1, 1, 1),
            padding=pads,
        )
    return out


def candidate_mask(prob: jax.Array, window=3, threshold=0.5) -> jax.Array:
    """Boolean mask of NMS candidates. jit-safe; window static, threshold
    may be a traced scalar (threshold sweeps don't recompile)."""
    mf = max_filter(prob, window)
    return (prob == mf) & (prob >= threshold)


@functools.partial(jax.jit, static_argnames=("window", "max_detections"))
def nms_device(
    prob: jax.Array,
    window=3,
    threshold=0.5,
    max_detections: int = 4096,
):
    """On-device NMS: returns (locs (k,3) int32, conf (k,) f32, valid (k,) bool).

    Invalid slots (beyond the number of true candidates) have valid=False.
    """
    prob = prob.astype(jnp.float32)
    mask = candidate_mask(prob, window, threshold)
    flat = jnp.where(mask.reshape(-1), prob.reshape(-1), -jnp.inf)
    max_detections = min(max_detections, flat.shape[0])
    conf, idx = lax.top_k(flat, max_detections)
    valid = conf > -jnp.inf
    shape = prob.shape
    z = idx // (shape[1] * shape[2])
    rem = idx % (shape[1] * shape[2])
    y = rem // shape[2]
    x = rem % shape[2]
    locs = jnp.stack([z, y, x], axis=1).astype(jnp.int32)
    return locs, conf, valid


_count_candidates = jax.jit(
    lambda prob, window, threshold: jnp.sum(
        candidate_mask(prob, window, threshold), dtype=jnp.int32
    ),
    static_argnames=("window",),
)


def nms(
    prob,
    window=3,
    threshold: float = 0.5,
    max_detections: int | None = None,
) -> Tbars:
    """Public `nms` verb: probability volume -> sorted detection list.

    Accepts a numpy or jax (z, y, x) float volume; device-computes the
    candidate extraction and returns a host-side ``Tbars`` in canonical
    order (conf desc, then z/y/x asc).

    The exact candidate count is device-computed first (one scalar
    transfer), then top-k extracts with k = the next power of two — large
    static k makes ``lax.top_k`` pathologically slow to compile, and the
    power-of-2 bucketing bounds recompiles.

    With the default ``max_detections=None`` the extraction auto-grows on
    saturation so no candidate is ever dropped.  An explicit
    ``max_detections`` is an actual cap (it bounds device memory): the
    top-``max_detections`` candidates are returned with a warning if more
    existed.
    """
    prob = jnp.asarray(prob).astype(jnp.float32)
    explicit_cap = max_detections is not None
    if max_detections is None:
        n_cand = int(
            _count_candidates(prob, to3d(window), float(threshold))
        )
        if n_cand == 0:
            return Tbars(locs=np.zeros((0, 3)), conf=np.zeros((0,)))
        max_detections = max(64, 1 << (n_cand - 1).bit_length())
    while True:
        locs, conf, valid = nms_device(
            prob, window=window, threshold=float(threshold),
            max_detections=max_detections,
        )
        valid = np.asarray(valid)
        n = int(valid.sum())
        if n < len(valid) or n == prob.size:
            break
        if explicit_cap:
            # the user-passed cap truly bounds result size/device memory;
            # report the truncation instead of silently growing past it
            import warnings

            warnings.warn(
                f"nms: more than max_detections={max_detections} candidates;"
                " returning the top ones (pass max_detections=None to"
                " auto-grow)",
                stacklevel=2,
            )
            break
        # saturated: grow and retry so no candidate is silently dropped
        max_detections *= 4
    return Tbars(
        locs=np.asarray(locs)[:n].astype(np.float64), conf=np.asarray(conf)[:n]
    )
