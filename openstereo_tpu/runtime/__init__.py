from .trainer import Trainer, input_hw  # noqa: F401
from .train_state import TrainState  # noqa: F401
from .optim import build_optimizer, build_schedule  # noqa: F401
