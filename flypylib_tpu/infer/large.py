"""Out-of-core whole-volume detection (HDF5 / any chunk-readable source).

For volumes too large for host RAM or HBM, detection runs ROI-by-ROI with
*exact* whole-volume semantics:

- **NMS**: each core ROI is fetched with a halo of ``context + window//2``
  true neighbor voxels (so every probability value a core voxel's NMS
  window touches is computed from real data, never from ROI padding),
  out-of-volume parts are reflect-filled in ONE pad (matching a monolithic
  run's face padding), and candidates are kept only by core ownership — a
  detection at a seam is reported exactly once, with exactly the
  monolithic decision.  Pinned by tests/test_large.py: chunked == full
  volume, bit-for-bit.
- **Connected components** (``method="components"``): each core ROI labels
  its own (disjoint) core box on device and exports, besides its
  compacted component stats, the converged label ids of its six boundary
  faces.  A host union-find then merges components whose boundary voxels
  are 6-adjacent across ROI seams (same trick as
  flypylib_tpu.parallel.halo.sharded_components, extended to a 3-D ROI
  grid), so centroids/confidences equal a monolithic
  ``scipy.ndimage.label`` run exactly.  Pinned by tests/test_large.py on
  non-divisible cores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flypylib_tpu.infer.pipeline import DetectPipeline
from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.models.zoo import ModelSpec
from flypylib_tpu.ops.host_reference import sort_detections
from flypylib_tpu.utils import to3d


def h5_reader(path: str, dataset: str | None = None):
    """(shape, read_fn) for an HDF5 dataset; read_fn(lo, hi) -> array."""
    import h5py

    f = h5py.File(path, "r")
    if dataset is None:
        from flypylib_tpu.io.hdf5 import DEFAULT_DATASET

        dataset = DEFAULT_DATASET if DEFAULT_DATASET in f else next(iter(f))
    ds = f[dataset]

    def read(lo, hi):
        return ds[tuple(slice(a, b) for a, b in zip(lo, hi))]

    return tuple(ds.shape), read


def array_reader(vol: np.ndarray):
    """In-RAM adapter with the same (shape, read_fn) interface."""
    vol = np.asarray(vol)

    def read(lo, hi):
        return vol[tuple(slice(a, b) for a, b in zip(lo, hi))]

    return vol.shape, read


def detect_streaming(
    spec: ModelSpec,
    variables,
    shape,
    read_fn,
    core: int = 128,
    tile_out: int | None = None,
    window=5,
    threshold: float = 0.5,
    max_detections_per_roi: int = 4096,
    max_components_per_roi: int = 4096,
    method: str = "nms",
    progress=None,
):
    """Exact streaming detection over an arbitrarily large volume.

    ``shape``/``read_fn`` typically come from :func:`h5_reader`.
    ``method`` is ``"nms"`` (local-maximum candidates), ``"components"``
    (seam-merged connected-component centroids), or ``"both"`` (returns a
    ``(nms, components)`` tuple).

    ``tile_out=None`` (default) covers each fetched ROI in ONE
    fully-convolutional tile — a tile smaller than the ROI extent makes
    the static tile grid overshoot (e.g. a 272-wide ROI under 256-wide
    tiles runs 8 tiles of 268^3: 4.6x redundant conv FLOPs); pass a
    smaller ``tile_out`` only when one ROI tile exceeds HBM.
    """
    if method not in ("nms", "components", "both"):
        raise ValueError(f"unknown method {method!r}")
    want_nms = method in ("nms", "both")
    want_cc = method in ("components", "both")

    shape = to3d(shape)
    win = to3d(window)
    ctx = spec.context
    h = ctx + (max(win) // 2 if want_nms else 0)
    h = max(h, ctx)  # CC needs at least the conv context halo
    fetch_halo = h + ctx  # plus the conv context for the halo's own probs

    core_dims = [min(core, s) for s in shape]
    # ownership partition: non-overlapping cores covering the volume
    starts = [
        list(range(0, s, c)) for s, c in zip(shape, core_dims)
    ]

    roi_extent = max(core_dims) + 2 * h
    pipe = DetectPipeline(
        spec, variables,
        vol_shape=tuple(c + 2 * h for c in core_dims),
        tile_out=roi_extent if tile_out is None
        else min(tile_out, roi_extent),
        window=window, threshold=threshold,
        max_detections=max_detections_per_roi,
        run_cc=False, pre_padded=True,
    )

    cz, cy, cx = core_dims
    core_nvox = cz * cy * cx
    vz, vy, vx = pipe.vol_shape

    @functools.lru_cache(maxsize=8)
    def cc_fn(K: int):
        from flypylib_tpu.ops.components import cc_label_and_extract

        @jax.jit
        def f(out, vlo, vhi, thr):
            prob = out[:vz, :vy, :vx]
            zz = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 0)
            yy = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 1)
            xx = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 2)
            inb = (
                (zz >= vlo[0]) & (zz < vhi[0])
                & (yy >= vlo[1]) & (yy < vhi[1])
                & (xx >= vlo[2]) & (xx < vhi[2])
            )
            prob = jnp.where(inb, prob, -jnp.inf)
            corep = jax.lax.slice(
                prob, (h, h, h), (h + cz, h + cy, h + cx)
            )
            uniq, sums, count, conf, valid, over, lab = (
                cc_label_and_extract(corep, thr, K)
            )
            faces = (
                lab[0], lab[cz - 1],
                lab[:, 0], lab[:, cy - 1],
                lab[:, :, 0], lab[:, :, cx - 1],
            )
            return uniq, sums, count, conf, valid, over, faces

        return f

    all_locs, all_conf = [], []
    cc_rois: dict[tuple, dict] = {}
    K = max_components_per_roi

    grid = [
        ((iz, iy, ix), (z0, y0, x0))
        for iz, z0 in enumerate(starts[0])
        for iy, y0 in enumerate(starts[1])
        for ix, x0 in enumerate(starts[2])
    ]

    def prep(corner):
        """Fetch + reflect-pad one ROI block (host work, prefetchable)."""
        lo_want = [c - fetch_halo for c in corner]
        hi_want = [
            c + cd + fetch_halo for c, cd in zip(corner, core_dims)
        ]
        lo = [max(0, v) for v in lo_want]
        hi = [min(s, v) for s, v in zip(shape, hi_want)]
        block = np.asarray(read_fn(lo, hi))
        # ONE reflect pad continues the volume past its faces —
        # identical to a monolithic run's face padding
        pads = [
            (l - lw, hw - hh)
            for l, lw, hw, hh in zip(lo, lo_want, hi_want, hi)
        ]
        block = np.pad(block, pads, mode="reflect")
        # prob-region coords of the true-volume box: voxels outside are
        # masked to -inf (monolithic boundary semantics)
        region0 = [v + ctx for v in lo_want]
        vlo = [max(0, -r0) for r0 in region0]
        vhi = [
            min(cd + 2 * h, s - r0)
            for cd, s, r0 in zip(core_dims, shape, region0)
        ]
        return block, lo_want, vlo, vhi

    # prefetch thread: the next ROI's disk read + pad rides under the
    # current ROI's device time
    import queue as _queue
    import threading

    fetched: _queue.Queue = _queue.Queue(maxsize=2)

    def producer():
        for key, corner in grid:
            try:
                fetched.put((key, corner, prep(corner), None))
            except Exception as e:  # surface on the consumer side
                fetched.put((key, corner, None, e))
                return

    threading.Thread(target=producer, daemon=True).start()

    for _ in grid:
        (iz, iy, ix), corner, prepped, err = fetched.get()
        if err is not None:
            raise RuntimeError(
                f"ROI {corner}: fetch failed"
            ) from err
        block, lo_want, vlo, vhi = prepped
        out = pipe.forward(block)
        n_own = 0
        if want_nms:
            # DetectPipeline grows its top-k and retries on saturation,
            # so the per-ROI list is always complete
            nms_det, _ = pipe.postprocess(out, vlo, vhi)
            # local coords are relative to lo_want; prob index 0 is at
            # global lo_want + ctx
            glob = nms_det.locs + np.asarray(
                [v + ctx for v in lo_want], np.float64
            )
            own = np.all(
                (glob >= np.asarray(corner))
                & (
                    glob
                    < np.minimum(
                        np.asarray(corner) + core_dims, np.asarray(shape)
                    )
                ),
                axis=1,
            )
            all_locs.append(glob[own])
            all_conf.append(nms_det.conf[own])
            n_own = int(own.sum())
        if want_cc:
            lo_j = jnp.asarray(vlo, jnp.int32)
            hi_j = jnp.asarray(vhi, jnp.int32)
            while True:
                # ONE bulk device->host transfer per ROI (each array
                # would otherwise cost a tunnel roundtrip)
                uniq, sums, count, conf, valid, over, faces = (
                    jax.device_get(
                        cc_fn(K)(out, lo_j, hi_j, jnp.float32(threshold))
                    )
                )
                if not bool(over):
                    break
                K *= 4  # grow-and-retry; later ROIs reuse the size
            sums = np.asarray(sums, np.float64)
            count = np.asarray(count, np.float64)
            # globalize coordinate sums by the core's corner
            sums += np.asarray(corner, np.float64) * count[:, None]
            cc_rois[(iz, iy, ix)] = {
                "uniq": uniq,
                "sums": sums,
                "count": count,
                "conf": conf,
                "valid": valid,
                "faces": list(faces),
            }
        if progress:
            progress(corner, n_own)

    results = []
    if want_nms:
        if all_locs:
            results.append(sort_detections(
                np.concatenate(all_locs), np.concatenate(all_conf)
            ))
        else:
            results.append(Tbars(locs=np.zeros((0, 3)), conf=np.zeros((0,))))
    if want_cc:
        from flypylib_tpu.ops.components import merge_component_fragments

        results.append(merge_component_fragments(cc_rois, core_nvox))
    if method == "both":
        return tuple(results)
    return results[0]


def detect_h5(
    spec: ModelSpec,
    variables,
    path: str,
    dataset: str | None = None,
    **kw,
) -> Tbars:
    """Streaming detection straight from an HDF5 file."""
    shape, read = h5_reader(path, dataset)
    return detect_streaming(spec, variables, shape, read, **kw)
