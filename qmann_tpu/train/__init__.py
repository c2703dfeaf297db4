from qmann_tpu.train.optim import (
    sgd_update, zero_null_columns, lr_schedule, rowsum_l2_norm,
)
from qmann_tpu.train.trainer import (
    train_task, train_epoch, evaluate, eval_split, TrainResult, EpochMetrics,
)

__all__ = [
    "sgd_update", "zero_null_columns", "lr_schedule", "rowsum_l2_norm",
    "train_task", "train_epoch", "evaluate", "eval_split", "TrainResult",
    "EpochMetrics",
]
