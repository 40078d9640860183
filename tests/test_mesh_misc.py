import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flypylib_tpu.infer.tiled import infer_volume
from flypylib_tpu.models.zoo import baseline_model
from flypylib_tpu.parallel import (
    batch_sharded,
    make_mesh,
    make_mesh_2d,
    replicated,
)
from flypylib_tpu.train.trainer import TrainData


def test_mesh_helpers():
    mesh = make_mesh(4, axis="data")
    assert mesh.shape["data"] == 4
    mesh2 = make_mesh_2d((2, 4), axes=("data", "space"))
    assert mesh2.shape == {"data": 2, "space": 4}
    r = replicated(mesh)
    b = batch_sharded(mesh)
    x = jax.device_put(jnp.zeros((8, 4)), b)
    assert x.sharding == b
    y = jax.device_put(jnp.zeros((8, 4)), r)
    assert y.sharding.is_fully_replicated


def test_infer_volume_convenience(rng):
    spec = baseline_model(features=(4,), dilations=(1,), head_features=8,
                          dtype=jnp.float32)
    variables = spec.init(jax.random.PRNGKey(0), 12)
    vol = rng.random((16, 16, 16)).astype(np.float32)
    out = infer_volume(spec, variables, vol, tile_out=12)
    assert out.shape == vol.shape


def test_traindata_pos_cap(rng):
    labels = np.ones((16, 16, 16), np.float32)  # 4096 positives
    data = TrainData.build(
        np.zeros_like(labels), labels, np.ones_like(labels), patch=8,
        pos_cap=100,
    )
    assert data.pos_locs.shape == (100, 4)
    assert int(data.n_pos) == 100
