from .state import TrainState, init_train_state
from .step import make_eval_step, make_train_step
from .trainer import Trainer

__all__ = [
    "TrainState",
    "init_train_state",
    "make_train_step",
    "make_eval_step",
    "Trainer",
]
