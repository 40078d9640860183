from flypylib_tpu.utils.cache import enable_compilation_cache
from flypylib_tpu.utils.core import (
    to3d,
    ceil_div,
    round_up,
    block_starts,
    pad_to_multiple,
    crop_center,
)

__all__ = [
    "enable_compilation_cache",
    "to3d",
    "ceil_div",
    "round_up",
    "block_starts",
    "pad_to_multiple",
    "crop_center",
]
