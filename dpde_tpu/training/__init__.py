from .state import (
    TrainState,
    make_optimizer,
    init_train_state,
    make_train_step,
    make_eval_step,
)
from .checkpoint import CheckpointManager, load_pretrained_params
from .loop import train

__all__ = [
    "TrainState",
    "make_optimizer",
    "init_train_state",
    "make_train_step",
    "make_eval_step",
    "CheckpointManager",
    "load_pretrained_params",
    "train",
]
