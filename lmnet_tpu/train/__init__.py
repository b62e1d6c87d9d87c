from lmnet_tpu.train.engine import (
    TrainState,
    cosine_epoch_schedule,
    create_train_state,
    eval_step,
    train_step,
)
from lmnet_tpu.train import checkpoint

__all__ = [
    "TrainState",
    "cosine_epoch_schedule",
    "create_train_state",
    "eval_step",
    "train_step",
    "checkpoint",
]
