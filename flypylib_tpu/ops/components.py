"""Connected components — on-device (XLA) labeling + centroid extraction.

Parity: flypylib fplobjdetect's CC path — ``scipy.ndimage.label`` on the
thresholded probability map with 6-connectivity, detections at component
centroids with the component max probability as confidence (SURVEY.md
section 3.3; semantics pinned in flypylib_tpu.ops.host_reference).

XLA has no native CC, so labeling runs as an iterative fixed point
(SURVEY.md section 7.3): each voxel's label starts as its own flat index,
every sweep takes the min over 6-neighbors (within the mask), then two
pointer-jumping steps (``label = label[label[label]]``) contract long paths,
giving O(log diameter)-ish convergence inside a ``lax.while_loop``.
Centroids/conf are extracted with static-size ``jnp.unique`` + segment
reductions so everything stays on device with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.ops.host_reference import sort_detections


def _neighbor_min(lab: jax.Array, mask: jax.Array, sentinel) -> jax.Array:
    """Min of label over the 6-neighborhood (self included), masked."""
    out = lab
    for axis in range(3):
        for shift in (1, -1):
            pad_cfg = [(0, 0, 0)] * 3
            pad_cfg[axis] = (1, 0, 0) if shift == 1 else (0, 1, 0)
            sl = [slice(None)] * 3
            sl[axis] = slice(None, -1) if shift == 1 else slice(1, None)
            shifted = lax.pad(lab[tuple(sl)], sentinel, pad_cfg)
            out = jnp.minimum(out, shifted)
    return jnp.where(mask, out, sentinel)


@functools.partial(jax.jit, static_argnames=("threshold", "max_components"))
def components_device(
    prob: jax.Array,
    threshold: float = 0.5,
    max_components: int = 1024,
):
    """On-device CC: returns (centroids (K,3) f32, conf (K,) f32,
    valid (K,) bool, overflowed () bool)."""
    prob = prob.astype(jnp.float32)
    shape = prob.shape
    n = int(np.prod(shape))
    sentinel = jnp.int32(n)
    mask = prob >= threshold

    idx = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    lab = jnp.where(mask, idx, sentinel)

    def jump(lab):
        flat = jnp.concatenate([lab.reshape(-1), sentinel[None]])
        return flat[flat[lab]]

    def body(state):
        lab, _ = state
        new = _neighbor_min(lab, mask, sentinel)
        new = jump(jump(new))
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    lab, _ = lax.while_loop(cond, body, (lab, jnp.bool_(True)))

    roots = lab.reshape(-1)
    # number of distinct components = number of self-rooted masked voxels
    n_comp = jnp.sum((roots == jnp.arange(n, dtype=jnp.int32)) & mask.reshape(-1))
    overflowed = n_comp > max_components

    uniq = jnp.unique(roots, size=max_components + 1, fill_value=sentinel)
    seg = jnp.searchsorted(uniq, roots).astype(jnp.int32)

    zz = (idx // (shape[1] * shape[2])).reshape(-1).astype(jnp.float32)
    yy = ((idx // shape[2]) % shape[1]).reshape(-1).astype(jnp.float32)
    xx = (idx % shape[2]).reshape(-1).astype(jnp.float32)

    num_segments = max_components + 1
    count = jax.ops.segment_sum(
        mask.reshape(-1).astype(jnp.float32), seg, num_segments
    )
    sums = jnp.stack(
        [
            jax.ops.segment_sum(c * mask.reshape(-1), seg, num_segments)
            for c in (zz, yy, xx)
        ],
        axis=1,
    )
    conf = jax.ops.segment_max(
        jnp.where(mask.reshape(-1), prob.reshape(-1), -jnp.inf), seg, num_segments
    )
    valid = (uniq < sentinel) & (count > 0)
    centroids = sums / jnp.maximum(count, 1.0)[:, None]
    return (
        centroids[:max_components],
        conf[:max_components],
        valid[:max_components],
        overflowed,
    )


def label_components(
    prob, threshold: float = 0.5, max_components: int = 1024
) -> Tbars:
    """Public CC verb: probability volume -> centroid detection list.

    Device-computed; grows ``max_components`` and retries on overflow so no
    component is silently dropped.
    """
    prob = jnp.asarray(prob)
    centroids, conf, valid, overflowed = components_device(
        prob, threshold=float(threshold), max_components=max_components
    )
    if bool(overflowed):
        return label_components(prob, threshold, max_components * 4)
    valid = np.asarray(valid)
    return sort_detections(
        np.asarray(centroids)[valid], np.asarray(conf)[valid]
    )
