"""Training stack: config, pjit train step, schedules, checkpoints, metrics."""

from graspbalance_tpu.train.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from graspbalance_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    make_optimizer,
)

__all__ = [
    "Config",
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
]
