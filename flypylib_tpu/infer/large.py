"""Out-of-core whole-volume detection (HDF5 / any chunk-readable source).

For volumes too large for host RAM or HBM, detection runs ROI-by-ROI with
*exact* whole-volume NMS semantics: each core ROI is fetched with a halo of
``context + window//2`` true neighbor voxels (so every probability value a
core voxel's NMS window touches is computed from real data, never from ROI
padding), out-of-volume parts are reflect-filled in ONE pad (matching a
monolithic run's face padding), and candidates are kept only by core
ownership — a detection at a seam is reported exactly once, with exactly
the monolithic decision.  Pinned by tests/test_large.py: chunked == full
volume, bit-for-bit.

CC across ROI seams is not merged here (components spanning a seam would
need a cross-ROI merge); use the in-RAM pipeline or sharded path when
component analysis must span the full volume.
"""

from __future__ import annotations

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
    tile_out: int = 128,
    window=5,
    threshold: float = 0.5,
    max_detections_per_roi: int = 4096,
    progress=None,
) -> Tbars:
    """Exact streaming NMS detection over an arbitrarily large volume.

    ``shape``/``read_fn`` typically come from :func:`h5_reader`.
    """
    shape = to3d(shape)
    win = to3d(window)
    ctx = spec.context
    h = ctx + max(win) // 2  # true-data halo for exact seam NMS
    fetch_halo = h + ctx  # plus the conv context for the halo's own probs

    core_dims = [min(core, s) for s in shape]
    # ownership partition: non-overlapping cores covering the volume
    starts = [
        list(range(0, s, c)) for s, c in zip(shape, core_dims)
    ]

    pipe = DetectPipeline(
        spec, variables,
        vol_shape=tuple(c + 2 * h for c in core_dims),
        tile_out=min(tile_out, max(core_dims) + 2 * h),
        window=window, threshold=threshold,
        max_detections=max_detections_per_roi,
        run_cc=False, pre_padded=True,
    )

    all_locs, all_conf = [], []
    for z0 in starts[0]:
        for y0 in starts[1]:
            for x0 in starts[2]:
                corner = (z0, y0, x0)
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
                # prob-region coords of the true-volume box: voxels outside
                # are masked to -inf inside the pipeline (monolithic
                # boundary semantics)
                region0 = [v + ctx for v in lo_want]
                vlo = [max(0, -r0) for r0 in region0]
                vhi = [
                    min(cd + 2 * h, s - r0)
                    for cd, s, r0 in zip(core_dims, shape, region0)
                ]
                # DetectPipeline grows its top-k and retries on saturation,
                # so the per-ROI detection list is always complete
                nms_det, _ = pipe(block, valid_lo=vlo, valid_hi=vhi)
                # local coords are relative to lo_want; h of that is the
                # conv context consumed by pre_padded, so prob index 0 is
                # at global lo_want + ctx
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
                if progress:
                    progress(corner, int(own.sum()))

    if not all_locs:
        return Tbars(locs=np.zeros((0, 3)), conf=np.zeros((0,)))
    return sort_detections(
        np.concatenate(all_locs), np.concatenate(all_conf)
    )


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
