"""Training: state, optimizer/schedule, jit-able steps, loop."""

from .state import TrainState
from .optim import build_optimizer, make_lr_schedule
from .train_step import make_train_step, make_eval_step

__all__ = ["TrainState", "build_optimizer", "make_lr_schedule",
           "make_train_step", "make_eval_step"]
