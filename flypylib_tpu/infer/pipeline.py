"""Fused detect pipeline: tiled forward + NMS + CC in ONE dispatch.

North star [B:5]: "rewrite the postprocessing as on-device XLA ops so
probability maps never leave HBM".  This module goes further for
latency-bound hosts: the ENTIRE volume pipeline — tile sweep over the
padded volume, sigmoid, NMS candidate extraction, connected-components
labeling and centroid/conf reduction — is a single jit; one host->device
upload (uint8 supported, 4x cheaper than f32 on the wire), one dispatch,
and only the tiny detection arrays come back.

Semantics are identical to running TiledInference + nms_device +
components_device separately (same ops, same order) — pinned by
tests/test_pipeline.py against the scipy host reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.models.zoo import ModelSpec
from flypylib_tpu.ops.host_reference import sort_detections
from flypylib_tpu.ops.nms import candidate_mask
from flypylib_tpu.utils import ceil_div, to3d


def _extract_topk(prob, mask, max_detections):
    flat = jnp.where(mask.reshape(-1), prob.reshape(-1), -jnp.inf)
    conf, idx = lax.top_k(flat, max_detections)
    valid = conf > -jnp.inf
    shape = prob.shape
    z = idx // (shape[1] * shape[2])
    rem = idx % (shape[1] * shape[2])
    locs = jnp.stack([z, rem // shape[2], rem % shape[2]], axis=1)
    return locs.astype(jnp.int32), conf, valid


class DetectPipeline:
    """One-dispatch volume -> detections engine for a fixed volume shape."""

    def __init__(
        self,
        spec: ModelSpec,
        variables,
        vol_shape,
        tile_out: int = 116,
        tile_batch: int = 1,
        window=5,
        threshold: float = 0.5,
        threshold_quantile: float | None = None,
        max_detections: int = 4096,
        max_components: int = 4096,
        input_scale: float | None = None,
        pad_mode: str = "reflect",
        run_cc: bool = True,
    ):
        """If ``threshold_quantile`` is set, the operating threshold is
        computed in-graph as that quantile of the probability map (handy
        for benchmarks/untrained nets); otherwise ``threshold`` is used.
        Threshold is traced, so changing it never recompiles."""
        from flypylib_tpu.infer.tiled import TiledInference
        from flypylib_tpu.ops.components import components_device

        self.spec = spec
        self.variables = variables
        self.vol_shape = to3d(vol_shape)
        self.window = to3d(window)
        self.threshold = float(threshold)
        self.max_detections = max_detections
        self.max_components = max_components
        self.input_scale = input_scale
        self.pad_mode = pad_mode
        self.run_cc = run_cc

        # reuse the tile-grid planner from TiledInference
        self._tiled = TiledInference(
            spec, variables, tile_out=tile_out, tile_batch=tile_batch
        )
        tin = self._tiled.tile_in
        corners, out_shape = self._tiled.plan(self.vol_shape)
        B = tile_batch
        n_batches = ceil_div(len(corners), B)
        corners = corners + [corners[-1]] * (n_batches * B - len(corners))
        self._corners = jnp.asarray(
            np.asarray(corners, np.int32).reshape(n_batches, B, 3)
        )
        self._out_shape = out_shape
        vz, vy, vx = self.vol_shape

        @jax.jit
        def run(variables, padded, corners):
            scale = input_scale
            if padded.dtype == jnp.uint8:
                scale = (1.0 / 255.0) if scale is None else scale

            out = jnp.zeros(out_shape, dtype=jnp.float32)

            def body(out, corner_batch):
                tiles = jax.vmap(
                    lambda c: lax.dynamic_slice(
                        padded, (c[0], c[1], c[2]), (tin, tin, tin)
                    )
                )(corner_batch)
                x = tiles.astype(jnp.float32)
                if scale is not None:
                    x = x * scale
                logits = spec.module.apply(variables, x[..., None], train=False)
                probs = jax.nn.sigmoid(logits[..., 0])

                def write(out, args):
                    tile, c = args
                    return (
                        lax.dynamic_update_slice(out, tile, (c[0], c[1], c[2])),
                        None,
                    )

                out, _ = lax.scan(write, out, (probs, corner_batch))
                return out, None

            out, _ = lax.scan(body, out, corners)
            prob = out[:vz, :vy, :vx]

            if threshold_quantile is not None:
                thr = jnp.quantile(prob, threshold_quantile)
            else:
                thr = jnp.float32(self.threshold)
            mask = candidate_mask(prob, self.window, thr)
            nms_out = _extract_topk(prob, mask, max_detections)
            if run_cc:
                cc_out = components_device(
                    prob, threshold=thr, max_components=max_components
                )
            else:
                cc_out = None
            return nms_out, cc_out

        self._run = run

    def prepare(self, volume: np.ndarray):
        """Host-side pad (reflect halo + grid extension); returns the array
        to upload.  uint8 stays uint8 on the wire."""
        vol = np.asarray(volume)
        if vol.dtype not in (np.uint8, np.float32):
            vol = vol.astype(np.float32)
        c = self._tiled.ctx
        padded = np.pad(vol, c, mode=self.pad_mode) if c else vol
        extra = [(0, os - s) for s, os in zip(self.vol_shape, self._out_shape)]
        return np.pad(padded, extra)

    def __call__(self, volume: np.ndarray):
        """volume -> (nms Tbars, cc Tbars | None). One upload, one dispatch."""
        padded = jax.device_put(self.prepare(volume))
        (locs, conf, valid), cc = self._run(
            self.variables, padded, self._corners
        )
        valid = np.asarray(valid)
        n = int(valid.sum())
        nms_det = Tbars(
            locs=np.asarray(locs)[:n].astype(np.float64),
            conf=np.asarray(conf)[:n],
        )
        cc_det = None
        if cc is not None:
            cents, cconf, cvalid, _ = cc
            cvalid = np.asarray(cvalid)
            cc_det = sort_detections(
                np.asarray(cents)[cvalid], np.asarray(cconf)[cvalid]
            )
        return nms_det, cc_det
