"""Multi-host (pod) bring-up helpers.

Aux subsystem (SURVEY.md section 2.3, eval config 5 [B:11]): on a TPU pod
each host runs the same program; ``jax.distributed.initialize`` wires the
hosts together, after which ``jax.devices()`` spans the whole slice and
the mesh/shard_map code in this package runs unchanged (XLA routes
collectives over ICI within a slice and DCN across slices).

Single-host (including this sandbox and the CPU test mesh) is a no-op, so
library code can call :func:`ensure_initialized` unconditionally.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("flypylib_tpu")

_initialized = False


def ensure_initialized(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Args default from the standard env vars (JAX auto-detects on Cloud
    TPU); returns True if distributed mode is active.
    """
    global _initialized
    if _initialized:
        return True
    # Cloud TPU pods set worker-topology env vars instead of the generic
    # coordinator ones; jax.distributed.initialize() auto-detects them with
    # no args.  TPU_WORKER_HOSTNAMES with >1 entry or a megascale
    # coordinator means this process is one host of a multi-host slice.
    tpu_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    cloud_multi = (
        len([h for h in tpu_hosts.split(",") if h.strip()]) > 1
        or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    )
    multi = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
        or cloud_multi
    )
    if not multi:
        return False
    if cloud_multi and coordinator_address is None and num_processes is None:
        jax.distributed.initialize()  # full auto-detection on Cloud TPU
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True


def local_batch_size(global_batch: int) -> int:
    """Per-process batch for a globally-sharded batch axis."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    return global_batch // n
