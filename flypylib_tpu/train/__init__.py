from flypylib_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    make_train_step,
    masked_bce_loss,
)

__all__ = ["TrainConfig", "Trainer", "make_train_step", "masked_bce_loss"]
