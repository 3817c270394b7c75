from .config import load_train_config, generate_train_config
from .logging import make_logger, JsonlLogger, NoOpLogger

__all__ = [
    "load_train_config",
    "generate_train_config",
    "make_logger",
    "JsonlLogger",
    "NoOpLogger",
]
