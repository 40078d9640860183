"""Multi-host bring-up actually executed: two REAL processes join via
jax.distributed on CPU, see the global device set, run a collective, and
take one data-parallel train step (SURVEY.md section 2.3 comm row — this
was claim-only until round 2).
"""

import json
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys

    # the script runs from a tmp dir: put the repo on sys.path explicitly
    # (PYTHONPATH can shadow this sandbox's sitecustomize backend setup)
    sys.path.insert(0, os.environ["FLYPYLIB_REPO"])

    import jax

    # sitecustomize force-registers the TPU backend; CPU must be forced
    # before any backend initialization (CLAUDE.md gotcha)
    jax.config.update("jax_platforms", "cpu")

    from flypylib_tpu.parallel.distributed import (
        ensure_initialized,
        local_batch_size,
    )

    coord = sys.argv[1]
    pid = int(sys.argv[2])
    active = ensure_initialized(
        coordinator_address=coord, num_processes=2, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("data",))

    # global psum over both processes' devices
    local = np.full((2, 4), float(jax.process_index() + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        jax.NamedSharding(mesh, P("data")), local
    )
    total = shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
        check_vma=False,
    )(garr)
    psum_val = float(np.asarray(jax.device_get(total)))

    # one dp train step over the global mesh (replicated host data)
    from flypylib_tpu.models.zoo import baseline_model
    from flypylib_tpu.parallel import make_dp_train_step
    from flypylib_tpu.train.trainer import TrainConfig, TrainData, Trainer

    spec = baseline_model(features=(4,), dilations=(1,), head_features=8,
                          dtype=jnp.float32)
    cfg = TrainConfig(patch_size=9, batch_size=len(devs), steps_per_epoch=1)
    rng = np.random.default_rng(0)  # same data on every process
    image = rng.random((16, 16, 16)).astype(np.float32)
    labels = (rng.random((16, 16, 16)) > 0.9).astype(np.float32)
    mask = np.ones((16, 16, 16), np.float32)
    data = TrainData.build(image, labels, mask, spec.valid_size(9))
    trainer = Trainer(spec, cfg, seed=0)
    state = trainer.init_state()
    step, _, _ = make_dp_train_step(spec, cfg, mesh)
    state, metrics = step(state, jax.random.PRNGKey(0), data)
    loss = float(jax.device_get(metrics["loss"]))

    print(json.dumps({
        "active": bool(active),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "psum": psum_val,
        "local_batch": local_batch_size(len(devs)),
        "loss": loss,
    }))
    """
)


def test_two_process_distributed_cpu(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    import os

    from pathlib import Path

    import flypylib_tpu

    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        FLYPYLIB_REPO=str(Path(flypylib_tpu.__file__).parents[1]),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        results.append(json.loads(out.strip().splitlines()[-1]))

    for i, r in enumerate(sorted(results, key=lambda r: r["process_index"])):
        assert r["active"] is True
        assert r["process_index"] == i
        assert r["process_count"] == 2
        assert r["global_devices"] == 4  # 2 virtual CPU devices per process
        assert r["local_devices"] == 2
        # psum of per-process constants: 8*(1) + 8*(2) = 24
        assert r["psum"] == 24.0
        assert r["local_batch"] == 2
        assert r["loss"] == results[0]["loss"]  # identical on both hosts
        assert r["loss"] > 0


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
