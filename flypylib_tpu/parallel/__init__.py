from flypylib_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    make_mesh_3d,
    replicated,
    batch_sharded,
)
from flypylib_tpu.parallel.train import make_dp_train_step
from flypylib_tpu.parallel.halo import (
    sharded_infer,
    sharded_nms,
    sharded_components,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_3d",
    "replicated",
    "batch_sharded",
    "make_dp_train_step",
    "sharded_infer",
    "sharded_nms",
    "sharded_components",
]
