"""Training engine: state, jitted steps, loop, rollout sampling."""

from .loop import Trainer
from .rollout import build_rollout
from .schedule import warmup_staircase_exponential_decay
from .state import GanModules, TrainState, create_train_state, make_optimizers
from .steps import build_train_step, gan_forward

__all__ = [
    "Trainer",
    "GanModules",
    "TrainState",
    "create_train_state",
    "make_optimizers",
    "build_train_step",
    "gan_forward",
    "build_rollout",
    "warmup_staircase_exponential_decay",
]
