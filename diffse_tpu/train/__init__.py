from .state import TrainState, create_train_state, ema_decay_schedule, eval_variables
from .steps import make_train_step, make_eval_step, make_snr_train_step
from .checkpoints import CheckpointManager

__all__ = [
    "TrainState",
    "create_train_state",
    "ema_decay_schedule",
    "eval_variables",
    "make_train_step",
    "make_eval_step",
    "make_snr_train_step",
    "CheckpointManager",
]
