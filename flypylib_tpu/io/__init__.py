from flypylib_tpu.io.hdf5 import read_h5, write_h5
from flypylib_tpu.io.synapses import (
    load_from_json,
    save_to_json,
    tbars_to_volume,
    make_training_volumes,
)
from flypylib_tpu.io.dvid import DVIDClient

__all__ = [
    "read_h5",
    "write_h5",
    "load_from_json",
    "save_to_json",
    "tbars_to_volume",
    "make_training_volumes",
    "DVIDClient",
]
