"""Benchmark: end-to-end predict + NMS + CC throughput (Mvox/s/chip).

North-star metric (BASELINE.json:2,5): Mvoxels/sec/chip for whole-volume
3D inference including on-device post-processing, on a synthetic FIB-SEM-
like volume.  ``vs_baseline`` is the speedup over the CPU reference path
(flypylib-equivalent: jax-CPU conv forward + scipy NMS/CC on host,
BASELINE.json:7 eval config 1), measured here on a smaller cutout and
normalized to Mvox/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mvox/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_volume(size: int, n_blobs: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vol = rng.normal(0.1, 0.05, (size,) * 3).astype(np.float32)
    centers = rng.integers(5, size - 5, (n_blobs, 3))
    g = np.arange(-4, 5)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    blob = np.exp(-(zz**2 + yy**2 + xx**2) / (2 * 2.0**2)).astype(np.float32)
    for c in centers:
        sl = tuple(slice(c[i] - 4, c[i] + 5) for i in range(3))
        vol[sl] = np.maximum(vol[sl], blob)
    return np.clip(vol, 0, 1)


def bench_tpu(size: int = 256, tile_out: int = 128, tile_batch: int = 4):
    import jax
    import jax.numpy as jnp

    from flypylib_tpu.infer.pipeline import DetectPipeline
    from flypylib_tpu.models.zoo import baseline_model

    spec = baseline_model()
    tin = spec.valid_size(tile_out + 2 * spec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    # uint8 grayscale on the wire (EM volumes are uint8 natively; 4x less
    # host->HBM traffic than f32)
    vol = (make_volume(size, n_blobs=max(8, size // 16)) * 255).astype(
        np.uint8
    )

    # operating threshold = in-graph quantile of the probability map tuned
    # for ~2000 candidate voxels regardless of volume size, so NMS/CC
    # process realistic (non-saturating) counts on an untrained net
    q = 1.0 - 2000.0 / vol.size
    pipe = DetectPipeline(
        spec, variables, vol.shape, tile_out=tile_out,
        tile_batch=tile_batch, window=5, threshold_quantile=q,
        max_detections=4096, max_components=4096,
    )
    nms_det, cc_det = pipe(vol)  # warm-up / compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        pipe(vol)
        times.append(time.perf_counter() - t0)
    dt = min(times)  # min over 5: the tunnel adds heavy-tailed jitter
    return vol.size / dt / 1e6, {
        "nms_detections": len(nms_det),
        "cc_components": len(cc_det),
        "seconds": dt,
    }


_CPU_REF_SNIPPET = """
import json, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from bench import make_volume
from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.ops.host_reference import components_host, nms_host

size = {size}
spec = baseline_model(dtype=jnp.float32)
c = spec.context
variables = spec.init(jax.random.PRNGKey(0), 2 * c + 9)
vol = make_volume(size, n_blobs=max(8, size // 16))
padded = np.pad(vol, c, mode="reflect")
x = jnp.asarray(padded[None, ..., None])
fwd = jax.jit(lambda v, x: jax.nn.sigmoid(
    spec.module.apply(v, x, train=False)[0, ..., 0]))
prob = np.asarray(fwd(variables, x))  # compile
thr = float(np.quantile(prob, 0.999))  # same operating point as TPU bench
t0 = time.perf_counter()
prob = np.asarray(fwd(variables, x))
nms_host(prob, window=5, threshold=thr)
components_host(prob, threshold=thr)
dt = time.perf_counter() - t0
print(json.dumps({{"mvox_s": vol.size / dt / 1e6}}))
"""


def bench_cpu_reference(size: int = 128):
    """flypylib-equivalent CPU path: conv forward on CPU + scipy NMS/CC.

    Runs in a subprocess because the sandbox pins JAX_PLATFORMS and the
    parent process already initialized the TPU backend.
    """
    import subprocess

    out = subprocess.run(
        [sys.executable, "-c", _CPU_REF_SNIPPET.format(size=size)],
        capture_output=True, text=True, timeout=1200,
        cwd=__import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    )
    line = out.stdout.strip().splitlines()[-1]
    return float(json.loads(line)["mvox_s"])


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    value, info = bench_tpu(size=size)
    try:
        # small cutout: the CPU path is ~1000x slower, a 64^3 measurement
        # already averages thousands of conv windows and keeps total bench
        # wall-clock within the driver's budget
        baseline = bench_cpu_reference(size=min(size, 64))
        vs = value / baseline
    except Exception:
        baseline, vs = None, None
    print(
        json.dumps(
            {
                "metric": "predict+nms+cc Mvox/s/chip (baseline 3D CNN, "
                f"{size}^3 volume)",
                "value": round(value, 2),
                "unit": "Mvox/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "cpu_reference_mvox_s": round(baseline, 2) if baseline else None,
                **info,
            }
        )
    )


if __name__ == "__main__":
    main()
