from .checkpoint import CheckpointManager
from .logger import AverageMeter, Logger
from .train_step import (
    OptimizerConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from .trainer import Trainer

__all__ = [
    "CheckpointManager",
    "AverageMeter",
    "Logger",
    "OptimizerConfig",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "Trainer",
]
