"""Test configuration: run the suite on a virtual 8-device CPU mesh.

SURVEY.md section 4 item 4: multi-chip logic (shard_map halo exchange, NMS
seam merge) is validated on N virtual CPU devices via
``--xla_force_host_platform_device_count``; the same code runs unchanged on
real TPU.  Must be set before jax initializes.
"""

import os

# The sandbox pins JAX_PLATFORMS=axon and sitecustomize imports jax at
# interpreter start, so plain env overrides are too late: force the platform
# through jax.config before any backend initializes.  XLA_FLAGS is read at
# (lazy) CPU client init, which hasn't happened yet at conftest import.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's ~1400 CPU executables are
# identical across runs; cache hits cut repeat-suite wall-clock
# substantially (measured in BENCH_NOTES.md round 3).  Keyed on HLO +
# jaxlib fingerprint, so stale hits are not a correctness risk.
from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_blob_volume(shape=(48, 48, 48), centers=None, sigma=2.5, rng=None):
    """Synthetic probability-like volume: Gaussian blobs at given centers."""
    shape = tuple(shape)
    if centers is None:
        centers = [(12, 12, 12), (30, 35, 20), (40, 10, 40)]
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = np.zeros(shape, dtype=np.float32)
    for c in centers:
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        vol = np.maximum(vol, np.exp(-d2 / (2 * sigma**2)).astype(np.float32))
    return vol, np.asarray(centers, dtype=np.float64)


@pytest.fixture
def blob_volume():
    return make_blob_volume()
