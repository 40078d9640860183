"""Persistent XLA compilation cache.

Fresh :class:`~flypylib_tpu.infer.large._StreamPlan`\\ s, tiled engines,
and train steps each cost minutes of remote XLA compile on a
tunnel-attached TPU (CLAUDE.md gotchas).  JAX's persistent compilation
cache removes that cost across PROCESSES: the serialized executable is
keyed on the HLO + compile options + runtime fingerprint and reloaded
instead of recompiled.  Measured through this sandbox's axon tunnel:
a DetectPipeline build + first call drops 117.5 s -> 2.3 s in a fresh
process with identical detections (BENCH_NOTES.md round 3).

This matters in production wherever processes restart with the same
geometry: elastic streaming workers re-joining a shared ROI queue
(:mod:`flypylib_tpu.infer.elastic`), repeated CLI invocations over the
same volume shapes, and CI/test runs.

Usage (before the first jit compilation; safe to call any time):

    from flypylib_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()          # ~/.cache/flypylib_tpu/xla
    enable_compilation_cache("/fast/disk/xla_cache")

Equivalently set ``JAX_COMPILATION_CACHE_DIR`` in the environment —
this helper only forwards to ``jax.config`` and exists so deployments
that cannot set env vars (and this sandbox, whose sitecustomize
re-forces the environment) have a programmatic switch.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(
    path: str | None = None,
    min_compile_time_secs: float = 1.0,
) -> str:
    """Turn on JAX's persistent compilation cache at ``path``.

    ``path`` defaults to ``$XDG_CACHE_HOME/flypylib_tpu/xla`` (or
    ``~/.cache/flypylib_tpu/xla``).  Executables whose compile took
    less than ``min_compile_time_secs`` are not persisted (skip churn
    from trivial dispatches).  Returns the cache directory.

    Call it BEFORE the process's first jit compilation: jax
    initializes the persistent cache lazily on first use and ignores
    later directory updates within the same process.
    """
    import jax

    if path is None:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        path = os.path.join(base, "flypylib_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    return path
