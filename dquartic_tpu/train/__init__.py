from .optim import WarmupCosineSchedule, make_optimizer
from .callbacks import CallbackHandler
from .trainer import Trainer, TrainState

__all__ = [
    "WarmupCosineSchedule",
    "make_optimizer",
    "CallbackHandler",
    "Trainer",
    "TrainState",
]
