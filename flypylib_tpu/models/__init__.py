from flypylib_tpu.models.zoo import (
    ModelSpec,
    baseline_model,
    vgg_like,
    unet,
    MODEL_ZOO,
)

__all__ = ["ModelSpec", "baseline_model", "vgg_like", "unet", "MODEL_ZOO"]
